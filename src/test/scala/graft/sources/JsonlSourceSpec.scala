package graft.sources

import graft.SparkSessionTestWrapper
import graft.engine.ValidationEngine
import graft.spec.SchemaParser
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class JsonlSourceSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private val specJson =
    """{
      "type": "object",
      "properties": {
        "doc_id":  {"type": "integer", "required": true, "minimum": 0},
        "text":    {"type": "string", "minLength": 3},
        "lang":    {"enum": ["en", "es"]},
        "score":   {"type": ["integer", "number"]},
        "tags":    {"type": "array", "items": {"type": "string"}},
        "nested":  {"type": "object",
                    "properties": {"k": {"type": "integer"}}}
      }
    }"""
  private val spec = SchemaParser.parse(specJson)

  test("schemaFor derives the physical schema the spec implies") {
    val st = JsonlSource.schemaFor(spec)
    val byName = st.fields.map(f => f.name -> f.dataType).toMap
    assert(byName("doc_id") == LongType)
    assert(byName("text") == StringType)
    assert(byName("lang") == StringType, "any-typed node inferred from its string enum")
    assert(byName("score") == DoubleType, "integer|number union widens to double")
    assert(byName("tags") == ArrayType(StringType, containsNull = true))
    assert(byName("nested") == StructType(Seq(StructField("k", LongType))))
    assert(byName(JsonlSource.CorruptCol) == StringType)
    assert(st.fields.forall(_.nullable))
  }

  test("underivable specs throw documented errors, never silently truncate") {
    def err(json: String): String =
      intercept[IllegalArgumentException] {
        JsonlSource.schemaFor(SchemaParser.parse(json))
      }.getMessage
    assert(err("""{"type":"object","properties":{"a":{"type":"array"}}}""")
      .contains("array without items"))
    assert(err("""{"type":"object","properties":{"a":{}}}""")
      .contains("'any'-typed"))
    assert(err("""{"type":"object","properties":{"a":{"type":["integer","string"]}}}""")
      .contains("no single physical type"))
  }

  test("JSONL roundtrip validates identically to the typed table") {
    val docs = Seq(
      (0L, "hello world", "en", 1.5, Seq("a", "b"), Some(7L)),
      (1L, "x", "es", 2.0, Seq.empty[String], None),  // minLength violation
      (-2L, "long enough", "de", 0.0, Seq("c"), Some(1L)) // minimum + enum violations
    ).toDF("doc_id", "text", "lang", "score", "tags", "k")
      .select(col("doc_id"), col("text"), col("lang"), col("score"), col("tags"),
        struct(col("k").as("k")).as("nested"))

    val direct = ValidationEngine.violations(docs, spec, Seq("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted

    val lines = docs.select(to_json(struct(docs.columns.map(col): _*)).as("value"))
    val parsed = JsonlSource.parse(lines, spec).drop(JsonlSource.CorruptCol)
    val viaJson = ValidationEngine.violations(parsed, spec, Seq("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted

    assert(viaJson.nonEmpty && viaJson.sameElements(direct))
  }

  test("malformed lines surface in the corrupt column; valid lines do not") {
    val lines = Seq(
      """{"doc_id": 1, "text": "fine here"}""",
      """{"doc_id": 2 "text": "missing comma"}""",
      """not json at all"""
    ).toDF("value")
    val parsed = JsonlSource.parse(lines, spec)
    val corrupt = parsed.where(col(JsonlSource.CorruptCol).isNotNull)
      .select(JsonlSource.CorruptCol).as[String].collect()
    assert(corrupt.length == 2)
    assert(corrupt.exists(_.contains("missing comma")) && corrupt.contains("not json at all"))
    val ok = parsed.where(col(JsonlSource.CorruptCol).isNull)
    assert(ok.count() == 1 && ok.select("doc_id").as[Long].head() == 1L)
  }

  test("parse composes with Structured Streaming (readStream lines ≡ batch)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val lines = Seq(
      """{"doc_id": 1, "text": "streamed fine"}""",
      """{"doc_id": -9, "text": "streamed bad id"}""",
      """garbage line""")
    val mem = MemoryStream[String]
    mem.addData(lines: _*)
    val parsed = JsonlSource.parse(mem.toDF(), spec)
    val q = ValidationEngine.annotate(parsed.drop(JsonlSource.CorruptCol), spec)
      .writeStream.format("memory").queryName("jsonl_stream").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("jsonl_stream")
        .select(col("doc_id"), col(ValidationEngine.PassCol))
        .collect().map(r => (Option(r.get(0)), r.getBoolean(1))).toSet
      // the garbage line flows through as an all-null row (valid=false:
      // doc_id is required), exactly like the batch path
      assert(got == Set((Some(1L), true), (Some(-9L), false), (None, false)))
    } finally q.stop()
  }

  test("uncoercible field values null the field AND flag the record corrupt") {
    val lines = Seq("""{"doc_id": "not a number", "text": "words here"}""").toDF("value")
    val parsed = JsonlSource.parse(lines, spec)
    val row = parsed.select(col("doc_id"), col(JsonlSource.CorruptCol)).head()
    assert(row.isNullAt(0), "the uncoercible field itself parses to null")
    assert(!row.isNullAt(1), "Spark PERMISSIVE flags a partially-uncoercible record corrupt")
    // validating anyway still surfaces the nulled field as a required violation
    val v = ValidationEngine.violations(parsed.drop(JsonlSource.CorruptCol), spec, Seq("text"))
      .select("constraint_id").as[String].collect()
    assert(v.contains("$.doc_id.required"))
  }
}
