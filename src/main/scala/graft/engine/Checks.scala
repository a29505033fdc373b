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
    * One hash aggregation: the skew defense is Spark's map-side PARTIAL
    * aggregation — every task pre-counts its local occurrences of each
    * key, so a pathologically hot key reaches its reducer as at most
    * one pre-counted row per upstream task, never as raw rows. (A
    * key-derived "salt" adds nothing: any pure function of the key sends
    * all duplicates of that key to the same group anyway.) Emits one
    * violation row per duplicated key with its multiplicity — never
    * `dropDuplicates` (which would lose the violation rows).
    * NULL keys are `required`-territory, not uniqueness, and are skipped.
    */
  def uniquenessViolations(df: DataFrame, keyCol: String): DataFrame =
    duplicateKeys(df, keyCol)
      .select(
        col(keyCol),
        lit(s"$$.$keyCol.unique").as("constraint_id"),
        col("multiplicity").cast("string").as("offending"))

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

  /** Per-group drift vs one shared baseline: returns `(group…, kl, psi)`.
    *
    * Every group must see EVERY baseline bucket — including buckets the
    * group has vanished from entirely (their q-mass is exactly the drift
    * signal). So the (tiny) baseline is expanded across the observed
    * group domain first, then full-outer joined with the observed
    * distribution so observed-only buckets keep their p-mass too.
    * Consistent with single-group [[drift]].
    *
    * Rows with a NULL group value are excluded up front: a null group
    * key is not a distribution slice (it is `required`-violation
    * territory, like null keys in uniqueness), and null keys never match
    * across the domain⋈observed join — they would surface as disjoint
    * eps-only p/q rows whose KL/PSI is meaningless.
    */
  def driftByGroup(observed: DataFrame, groupCols: Seq[String],
      baseline: DataFrame, eps: Double = 1e-6): DataFrame = {
    val g = groupCols.map(col)
    val obs0 = observed.where(g.map(_.isNotNull).reduce(_ && _))
    val totals = obs0.groupBy(g: _*).agg(sum(col("n")).cast("double").as("_t"))
    val obsP = obs0
      .join(totals, groupCols)
      .select(g ++ Seq(col("bucket"), (col("n") / col("_t")).as("p_obs")): _*)
    val domain = obs0.select(g: _*).distinct()
      .crossJoin(broadcast(baseline.select(col("bucket"), col("p").as("p_base"))))
    domain
      .join(obsP, groupCols :+ "bucket", "full_outer")
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
