package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-level (cross-row) checks: uniqueness, referential integrity,
  * and distribution drift. These are the capabilities the north star adds
  * beyond the reference's per-value keywords (SURVEY.md §2.6); each
  * returns violation rows compatible with [[ValidationEngine.violations]].
  */
object Checks {

  /** Exact key-uniqueness violations, skew-safe at 10^12 rows.
    *
    * Two-phase salted aggregation: phase 1 pre-aggregates on
    * `(xxhash64(key) % salt, key)` so a pathologically hot key (or a hot
    * hash partition) is split across `salt` reducers and combined
    * map-side; phase 2 merges the per-salt counts. Emits one violation
    * row per duplicated key with its multiplicity — never
    * `dropDuplicates` (which would lose the violation rows).
    * NULL keys are `required`-territory, not uniqueness, and are skipped.
    */
  def uniquenessViolations(df: DataFrame, keyCol: String, salt: Int = 64): DataFrame = {
    val k = col(keyCol)
    df.where(k.isNotNull)
      .groupBy(pmod(xxhash64(k), lit(salt)).as("_salt"), k.as(keyCol))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col(keyCol))
      .agg(sum(col("_c")).as("multiplicity"))
      .where(col("multiplicity") > 1)
      .select(
        col(keyCol),
        lit(s"$$.$keyCol.unique").as("constraint_id"),
        col("multiplicity").cast("string").as("offending"))
  }

  /** Keys present with multiplicity, for partition verdict rollups. */
  def duplicateKeys(df: DataFrame, keyCol: String): DataFrame =
    df.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("multiplicity"))
      .where(col("multiplicity") > 1)

  /** Referential-integrity violations: fact keys with no match in the
    * dimension. The dimension is broadcast (it is small by construction),
    * so the check is a map-side anti join — no shuffle of the fact table.
    */
  def referentialViolations(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String): DataFrame = {
    val missing = fact
      .join(broadcast(dim.select(col(dimKey)).distinct()),
        fact(factKey) === dim(dimKey), "left_anti")
      .where(col(factKey).isNotNull)
    missing.select(
      col(factKey),
      lit(s"$$.$factKey.referential").as("constraint_id"),
      col(factKey).cast("string").as("offending"))
  }

  /** Histogram of `valueCol` in fixed-width buckets — the shared shape for
    * drift checks. One hash aggregation; bucket count is tiny so the
    * shuffle is negligible.
    */
  def histogram(df: DataFrame, valueCol: String, bucketWidth: Double,
      groupCols: Seq[String] = Nil): DataFrame = {
    val bucket = floor(col(valueCol) / bucketWidth).cast("long").as("bucket")
    df.where(col(valueCol).isNotNull)
      .groupBy((groupCols.map(col) :+ (bucket: Column)): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** KL divergence and PSI of an observed bucket distribution vs a
    * baseline profile `(bucket, p)`. The baseline is tiny and broadcast;
    * smoothing `eps` keeps log terms finite for empty buckets (standard
    * PSI practice). Output: one row `(kl, psi)`.
    */
  def drift(observed: DataFrame, baseline: DataFrame, eps: Double = 1e-6): DataFrame = {
    val totalObs = observed.agg(sum(col("n")).cast("double").as("t"))
    val obsP = observed.crossJoin(broadcast(totalObs))
      .select(col("bucket"), (col("n") / col("t")).as("p_obs"))
    val joined = obsP
      .join(broadcast(baseline.select(col("bucket"), col("p").as("p_base"))),
        Seq("bucket"), "full_outer")
      .select(
        coalesce(col("p_obs"), lit(0.0)).as("p"),
        coalesce(col("p_base"), lit(0.0)).as("q"))
      .select(
        (col("p") + eps).as("p"),
        (col("q") + eps).as("q"))
    joined.agg(
      sum(col("p") * log(col("p") / col("q"))).as("kl"),
      sum((col("p") - col("q")) * log(col("p") / col("q"))).as("psi"))
  }

  /** Per-group drift vs one shared baseline: returns `(group…, kl, psi)`. */
  def driftByGroup(observed: DataFrame, groupCols: Seq[String],
      baseline: DataFrame, eps: Double = 1e-6): DataFrame = {
    val g = groupCols.map(col)
    val totals = observed.groupBy(g: _*).agg(sum(col("n")).cast("double").as("_t"))
    observed
      .join(totals, groupCols)
      .select(g ++ Seq(col("bucket"), (col("n") / col("_t")).as("p_obs")): _*)
      .join(broadcast(baseline.select(col("bucket"), col("p").as("p_base"))),
        Seq("bucket"), "full_outer")
      .where(g.head.isNotNull) // full-outer fills only bucket gaps per group
      .select(g ++ Seq(
        (coalesce(col("p_obs"), lit(0.0)) + eps).as("p"),
        (coalesce(col("p_base"), lit(0.0)) + eps).as("q")): _*)
      .groupBy(g: _*)
      .agg(
        sum(col("p") * log(col("p") / col("q"))).as("kl"),
        sum((col("p") - col("q")) * log(col("p") / col("q"))).as("psi"))
  }

  /** Cross-column consistency: `expr` must hold for every row; emits
    * violation rows keyed by `keyCol` (e.g. `n_tok === size(tokens)`).
    */
  def consistencyViolations(df: DataFrame, keyCol: String,
      constraintId: String, holds: Column, offending: Column): DataFrame =
    df.where(!coalesce(holds, lit(false)))
      .select(
        col(keyCol),
        lit(constraintId).as("constraint_id"),
        offending.cast("string").as("offending"))
}
