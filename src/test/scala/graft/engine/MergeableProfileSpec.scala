package graft.engine

import graft.SparkSessionTestWrapper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MergeableProfileSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private val Cols = Seq("lang", "score")
  private val NB = 8

  // 4 batches, nulls in both columns, skewed batch sizes
  private lazy val df = (0 until 400).map { i =>
    (i.toLong,
      if (i % 11 == 3) null else s"lang${i % 7}",
      if (i % 13 == 5) None else Some(i % 40),
      i % 4)
  }.toDF("id", "lang", "score", "b")

  private lazy val batches =
    MergeableProfile.batchProfile(df, "b", Cols, "score", 5.0, NB)
  private lazy val merged = MergeableProfile.merge(batches, Cols, NB)
  private lazy val whole =
    MergeableProfile.batchProfile(df.withColumn("_one", lit(1)), "_one", Cols, "score", 5.0, NB)

  test("merged batch profiles ≡ whole-table profile: exact fields") {
    def exact(p: org.apache.spark.sql.DataFrame) =
      MergeableProfile.estimates(p, Cols)
        .select("column", "n", "n_null", "null_rate", "min", "max")
        .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val m = exact(merged)
    val w = exact(whole.drop("batch"))
    assert(m == w)
    // native-typed min/max: score min is "0" (int merge), not a
    // lexicographic artifact
    val score = MergeableProfile.estimates(merged, Cols)
      .where(col("column") === "score").collect()(0)
    assert(score.getString(4) == "0" && score.getString(5) == "39")
  }

  test("merged HLL sketches estimate exactly like the whole-table sketch") {
    def est(p: org.apache.spark.sql.DataFrame) =
      MergeableProfile.estimates(p, Cols)
        .select("column", "approx_distinct")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val m = est(merged)
    val w = est(whole.drop("batch"))
    assert(m == w, s"union-of-sketches must estimate like sketch-of-union: $m vs $w")
    // at this cardinality the sketch is exact
    assert(m("lang") == 7L)
    assert(m("score") == 40L)
  }

  test("merged histogram ≡ whole-table histogram (element-wise sum)") {
    val m = merged.select("hist").collect()(0).getSeq[Long](0)
    val w = whole.select("hist").collect()(0).getSeq[Long](0)
    assert(m == w)
    assert(m.sum == df.where(col("score").isNotNull).count())
  }

  test("driftFromProfiles: self-drift ~0, shifted distribution flags") {
    val selfDrift = MergeableProfile.driftFromProfiles(merged, merged)
      .collect()(0)
    assert(math.abs(selfDrift.getDouble(0)) < 1e-6)
    assert(math.abs(selfDrift.getDouble(1)) < 1e-6)

    val shifted = MergeableProfile.batchProfile(
      df.withColumn("score", col("score") + 20).withColumn("_one", lit(1)),
      "_one", Cols, "score", 5.0, NB)
    val d = MergeableProfile.driftFromProfiles(merged, shifted.drop("batch"))
      .collect()(0)
    assert(d.getDouble(1) > 1.0, s"shifted scores must show large PSI, got $d")

    // artifact-only drift ≡ raw-data drift over the same bucketing
    // scores are 0..39 — inside the profile's clamp range, so the raw
    // floor-bucketing and the artifact's clamped bucketing coincide
    val raw = Checks.drift(
      Checks.histogram(df, "score", 5.0),
      MergeableProfile.histBaseline(merged)).collect()(0)
    assert(math.abs(raw.getDouble(1)) < 1e-6, s"raw self-drift must agree, got $raw")
  }

  test("artifacts round-trip through parquet and merge across runs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_prof").toString
    batches.where(col("batch") < 2).write.mode("overwrite").parquet(s"$dir/run1")
    batches.where(col("batch") >= 2).write.mode("overwrite").parquet(s"$dir/run2")
    val reloaded = spark.read.parquet(s"$dir/run1")
      .unionByName(spark.read.parquet(s"$dir/run2"))
    val m2 = MergeableProfile.estimates(
      MergeableProfile.merge(reloaded, Cols, NB), Cols).collect()
      .map(r => r.getString(0) -> r.toSeq.tail).toMap
    val m1 = MergeableProfile.estimates(merged, Cols).collect()
      .map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(m1 == m2)
  }
}
