package graft.engine

import graft.SparkSessionTestWrapper
import graft.gen.SequenceGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChecksSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private lazy val df = SequenceGen.generate(spark, 8000).cache()

  test("uniqueness finds exactly the injected duplicate doc_ids") {
    val dups = Checks.uniquenessViolations(df, "doc_id").collect()
    // injected: id % 1000 == 17 (id >= 1000) takes doc_id of id-999
    val expected = (1017L until 8000L by 1000L).map(id => SequenceGen.docIdOf(id - 999)).toSet
    assert(dups.map(_.getString(0)).toSet == expected)
    assert(dups.forall(_.getString(2) == "2")) // multiplicity
    assert(dups.forall(_.getString(1) == "$.doc_id.unique"))
  }

  test("referential check finds exactly the injected unknown sources") {
    val dim = SequenceGen.sourcesDim(spark)
    val bad = Checks.referentialViolations(df, "source", dim, "source").collect()
    val expectedCount = (0L until 8000L).count(_ % 2000 == 23)
    assert(bad.length == expectedCount)
    assert(bad.forall(_.getString(0) == "src_unknown"))
  }

  test("consistency check finds exactly the injected n_tok mismatches") {
    val v = Checks.consistencyViolations(df, "doc_id", "$.n_tok.consistent",
      col("n_tok") === size(col("tokens")), col("n_tok"))
    val got = v.collect()
    val expectedCount = (0L until 8000L).count(_ % 1000 == 41)
    assert(got.length == expectedCount)
  }

  test("drift: shifted slice (src3) trips PSI, unshifted slice does not") {
    val clean = df.where(col("source") =!= "src_unknown")
    val hist = Checks.histogram(clean, "n_tok", 32.0, Seq("source"))
    val base = SequenceGen.baselineProfile(spark, 32)
    val drift = Checks.driftByGroup(hist, Seq("source"), base).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(drift("src3") > 0.1, s"src3 PSI=${drift("src3")} should exceed 0.1")
    assert(drift("src1") < 0.1, s"src1 PSI=${drift("src1")} should be small")
  }

  test("driftByGroup charges a group for baseline buckets it vanished from") {
    import spark.implicits._
    // group g1 covers both baseline buckets; g2 lost bucket 1 entirely
    val observed = Seq(
      ("g1", 0L, 50L), ("g1", 1L, 50L),
      ("g2", 0L, 100L)).toDF("g", "bucket", "n")
    val baseline = Seq((0L, 0.5), (1L, 0.5)).toDF("bucket", "p")
    val drift = Checks.driftByGroup(observed, Seq("g"), baseline).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(math.abs(drift("g1")._1) < 1e-4 && math.abs(drift("g1")._2) < 1e-4)
    // g2: p=(1,0) vs q=(0.5,0.5) → KL ≈ ln 2; the vanished bucket's
    // q-mass is ~half the PSI — dropping it (the old bug) halves the score
    assert(drift("g2")._1 > 0.6, s"KL=${drift("g2")._1} must include the lost bucket")
    assert(drift("g2")._2 > 6.0, s"PSI=${drift("g2")._2} must include the lost bucket")
    // observed-only buckets keep their p-mass too (full-outer, not left)
    val obs2 = Seq(("g3", 7L, 100L)).toDF("g", "bucket", "n")
    val d3 = Checks.driftByGroup(obs2, Seq("g"), baseline).collect()(0)
    assert(d3.getDouble(1) > 1.0, "a group entirely outside the baseline must score high")
  }

  test("driftByGroup excludes null group keys (no eps-only ghost rows)") {
    import spark.implicits._
    // a null group key never matches itself across the domain⋈observed
    // join — it would produce disjoint eps-only p/q rows with garbage
    // KL/PSI; it is excluded as required-violation territory instead
    val observed = Seq(
      (Some("g1"), 0L, 50L), (Some("g1"), 1L, 50L),
      (None, 0L, 10L)).toDF("g", "bucket", "n")
    val baseline = Seq((0L, 0.5), (1L, 0.5)).toDF("bucket", "p")
    val rows = Checks.driftByGroup(observed, Seq("g"), baseline).collect()
    assert(rows.length == 1 && rows(0).getString(0) == "g1")
    assert(math.abs(rows(0).getDouble(1)) < 1e-4)
  }

  test("HLL approx_distinct tracks exact countDistinct within 3x the configured rsd") {
    val big = SequenceGen.generate(spark, 20000)
    val approx = TableProfiler.profile(big)
      .collect().map(r => r.getString(0) -> r.getLong(6)).toMap
    val exact = Seq("doc_id", "n_tok", "source").map { c =>
      c -> big.select(countDistinct(col(c))).collect()(0).getLong(0)
    }.toMap
    exact.foreach { case (c, e) =>
      val a = approx(c)
      assert(math.abs(a - e).toDouble / math.max(e, 1L) <= 0.15,
        s"$c: approx=$a exact=$e drifts beyond 15%")
    }
  }

  test("histogram buckets match a direct groupBy") {
    val h = Checks.histogram(df, "n_tok", 32.0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = df.groupBy(floor(col("n_tok") / 32).cast("long")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h == direct)
  }
}
