package graft.engine

import graft.SparkSessionTestWrapper
import graft.gen.SequenceGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChecksSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private lazy val df = SequenceGen.generate(spark, 8000).cache()

  test("salted uniqueness finds exactly the injected duplicate doc_ids") {
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

  test("histogram buckets match a direct groupBy") {
    val h = Checks.histogram(df, "n_tok", 32.0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = df.groupBy(floor(col("n_tok") / 32).cast("long")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h == direct)
  }
}
