package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream: a session is a maximal
  * run of one entity's events with no gap above `gapSeconds`. The classic
  * event-analytics shape (and the skew-aware window pattern): one shuffle
  * by entity, then per-entity lag + conditional running sum assigns
  * `session_seq` without materializing session boundaries as a join.
  *
  * Determinism: events are ordered by (timestamp, event id) so same-second
  * ties never flap between runs or engines.
  */
object Sessions {

  /** Annotate each event with its 1-based `session_seq` within its
    * entity. `session_seq = running count of session STARTS` — an event
    * starts a session iff it is the entity's first event or follows a gap
    * strictly greater than `gapSeconds`.
    *
    * One shuffle (the window's hash partitioning by `entityCol`); the
    * per-partition sort is the window's only extra cost. At corpus scale
    * a single hot entity bounds a partition to that entity's event count
    * — entities are users/devices, so the per-key volume is human-scale;
    * for machine-generated hot keys, pre-split by a time bucket first.
    */
  def sessionize(events: DataFrame, entityCol: String, tsCol: String,
      idCol: String, gapSeconds: Long = 1800L): DataFrame = {
    require(gapSeconds > 0, "gapSeconds must be positive")
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val prev = lag(col(tsCol), 1).over(w)
    val isStart: Column = prev.isNull ||
      (unix_timestamp(col(tsCol)) - unix_timestamp(prev)) > gapSeconds
    events.withColumn("session_seq",
      sum(isStart.cast("long")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** One row per session: event count, span, and value total. The
    * aggregation keys (entity, session_seq) are clustered by the
    * window's hash(entity) partitioning, so Catalyst plans the final
    * group WITHOUT a second shuffle — the whole op is one exchange.
    */
  def sessionStats(events: DataFrame, entityCol: String, tsCol: String,
      idCol: String, valueCol: String, gapSeconds: Long = 1800L): DataFrame =
    sessionize(events, entityCol, tsCol, idCol, gapSeconds)
      .groupBy(col(entityCol), col("session_seq"))
      .agg(count(lit(1L)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"),
        sum(round(col(valueCol) * 100).cast("long")).as("sum_value_c"))

  /** [[sessionStats]] in two levels for MACHINE-HOT keys — the scale
    * path [[sessionize]]'s docs point to when one entity's event count
    * exceeds what a single window partition should sort (measured: a
    * 10M-event single-user partition works at 20M rows under a 20 GB
    * heap, but is a straight-line single-task latency/spill cliff at
    * 100×).
    *
    * Level 1 sessionizes within `(entity, floor(ts / bucketSeconds))`
    * partitions — the hot key's sort is bounded by its events per
    * bucket — and collapses each local run to a compact stub
    * `(n_events, start_ts, end_ts, sum_value_c)`. Level 2 gap-merges
    * the stubs per entity: stubs are time-disjoint intervals in start
    * order, so the event-level criterion reduces exactly to
    * `start_ts − prev_end_ts > gap` over stubs (two stubs of one bucket
    * never merge — their boundary gap exceeded the threshold by
    * construction; a cross-bucket pair merges iff its boundary EVENTS
    * would, because the stub endpoints ARE those events' timestamps;
    * chains spanning many buckets fold via the same running sum of
    * merge starts). Output ≡ [[sessionStats]] row-for-row (asserted by
    * a SessionsSpec differential and the shared `evt_sessions` oracle).
    *
    * Cost: one extra exchange (stubs by entity) over [[sessionStats]] —
    * but the per-entity partition now holds session STUBS (5 narrow
    * columns, one row per local session) instead of raw events. Size
    * `bucketSeconds` ≥ `gapSeconds` so most sessions stay within one
    * bucket and the stub count stays near the true session count.
    */
  def sessionStatsBucketed(events: DataFrame, entityCol: String, tsCol: String,
      idCol: String, valueCol: String, gapSeconds: Long = 1800L,
      bucketSeconds: Long = 86400L): DataFrame = {
    require(gapSeconds > 0, "gapSeconds must be positive")
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val wLocal = Window.partitionBy(col(entityCol), col("_bkt"))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val prev = lag(col(tsCol), 1).over(wLocal)
    val isStart: Column = prev.isNull ||
      (unix_timestamp(col(tsCol)) - unix_timestamp(prev)) > gapSeconds
    // level 1: local sessions inside (entity, bucket); the groupBy keys
    // are clustered by the window's exchange, so collapsing runs to
    // stubs adds no shuffle
    val stubs = events
      .withColumn("_bkt", floor(unix_timestamp(col(tsCol)) / bucketSeconds))
      .withColumn("_lseq", sum(isStart.cast("long")).over(
        wLocal.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(entityCol), col("_bkt"), col("_lseq"))
      .agg(count(lit(1L)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"),
        sum(round(col(valueCol) * 100).cast("long")).as("sum_value_c"))
    // level 2: gap-merge stubs per entity. start_ts is unique per entity
    // (same-ts events share a bucket and, at gap 0 <= gapSeconds, a
    // local session), so the order is total and deterministic.
    val wEnt = Window.partitionBy(col(entityCol)).orderBy(col("start_ts").asc)
    val prevEnd = lag(col("end_ts"), 1).over(wEnt)
    val mergeStart: Column = prevEnd.isNull ||
      (unix_timestamp(col("start_ts")) - unix_timestamp(prevEnd)) > gapSeconds
    stubs
      .withColumn("session_seq", sum(mergeStart.cast("long")).over(
        wEnt.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(entityCol), col("session_seq"))
      .agg(sum(col("n_events")).as("n_events"),
        min(col("start_ts")).as("start_ts"),
        max(col("end_ts")).as("end_ts"),
        sum(col("sum_value_c")).as("sum_value_c"))
  }
}
