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
}
