package graft.streaming

import graft.SparkSessionTestWrapper
import graft.spec.SchemaParser
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class StreamingValidationSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val spec = SchemaParser.parse(
    """{"type":"object","properties":{
        "doc_id":{"type":"string","required":true,"pattern":"^d[0-9]+$"},
        "n_tok":{"type":"integer","minimum":1}}}""")

  case class Ev(doc_id: String, n_tok: Int, ts: Timestamp)
  private def t(s: Int) = new Timestamp(1700000000000L + s * 1000L)

  test("streaming annotate: same verdicts as batch, incremental batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingValidation.annotate(mem.toDF(), spec)
      .select($"doc_id", $"valid")
      .writeStream.format("memory").queryName("sv_annotate").outputMode("append").start()
    try {
      mem.addData(Ev("d1", 5, t(0)), Ev("BAD", 5, t(1)), Ev("d2", 0, t(2)))
      q.processAllAvailable()
      val got = spark.table("sv_annotate").collect()
        .map(r => r.getString(0) -> r.getBoolean(1)).toMap
      assert(got == Map("d1" -> true, "BAD" -> false, "d2" -> false))
      // second micro-batch continues incrementally
      mem.addData(Ev("d3", 2, t(3)))
      q.processAllAvailable()
      assert(spark.table("sv_annotate").count() == 4)
    } finally q.stop()
  }

  test("windowed violation counts with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingValidation
      .violationCountsByWindow(mem.toDF(), spec, "ts", "10 seconds", "5 seconds")
      .writeStream.format("memory").queryName("sv_windows").outputMode("update").start()
    try {
      mem.addData(Ev("BAD", 5, t(1)), Ev("BAD2", 5, t(2)), Ev("d1", 0, t(11)))
      q.processAllAvailable()
      val got = spark.table("sv_windows").collect()
        .map(r => (r.getString(1), r.getLong(2)))
      assert(got.contains(("$.doc_id.pattern", 2L))) // both BADs in window 0-10s
      assert(got.contains(("$.n_tok.minimum", 1L)))  // d1 in window 10-20s
    } finally q.stop()
  }

  test("streaming dedup within watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingValidation.dedupStream(mem.toDF(), "doc_id", "ts", "10 seconds")
      .writeStream.format("memory").queryName("sv_dedup").outputMode("append").start()
    try {
      mem.addData(Ev("d1", 1, t(0)), Ev("d1", 2, t(1)), Ev("d2", 3, t(2)))
      q.processAllAvailable()
      mem.addData(Ev("d1", 4, t(3))) // still within watermark → suppressed
      q.processAllAvailable()
      val ids = spark.table("sv_dedup").collect().map(_.getString(0)).toSeq
      assert(ids.sorted == Seq("d1", "d2"))
    } finally q.stop()
  }
}
