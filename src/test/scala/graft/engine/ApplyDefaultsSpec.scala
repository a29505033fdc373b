package graft.engine

import graft.SparkSessionTestWrapper
import graft.oracle.OracleValidator
import graft.spec.SchemaParser
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.scalatest.funsuite.AnyFunSuite

/** `default` application parity with the reference's compiled path
  * (reference: src/Data/Aeson/Schema/CodeGen.hs:342-350 — generated
  * parsers substitute `schemaDefault` for missing properties; the
  * interpreter does not, hence an explicit opt-in projection here).
  */
class ApplyDefaultsSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private val specJson =
    """{
      "type": "object",
      "properties": {
        "a": {"type": "integer", "default": 42, "minimum": 10},
        "b": {"type": "string", "default": "fallback", "minLength": 3},
        "c": {"type": "integer"},
        "nest": {"type": "object",
                 "properties": {"x": {"type": "integer", "default": 7},
                                "y": {"type": "string"}}}
      }
    }"""
  private lazy val spec = SchemaParser.parse(specJson)

  private lazy val df = {
    val schema = StructType(Seq(
      StructField("a", LongType, nullable = true),
      StructField("b", StringType, nullable = true),
      StructField("c", LongType, nullable = true),
      StructField("nest", StructType(Seq(
        StructField("x", LongType, nullable = true),
        StructField("y", StringType, nullable = true))), nullable = true)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(15L, "hello", 1L, Row(1L, "q")), // all present
        Row(null, null, null, Row(null, "z")), // a,b defaulted; nest.x defaulted
        Row(null, "okay", 2L, null)), // a defaulted; nest stays NULL (absent ≠ {})
      schema)
  }

  test("applyDefaults fills absent top-level and nested properties, leaves present values") {
    val got = ValidationEngine.applyDefaults(df, spec)
      .select("a", "b", "c", "nest").collect()
    assert(got(0) == Row(15L, "hello", 1L, Row(1L, "q")))
    assert(got(1) == Row(42L, "fallback", null, Row(7L, "z")))
    assert(got(2) == Row(42L, "okay", 2L, null), "wholly-absent struct stays NULL")
  }

  test("validation after defaults ≡ oracle on default-filled JSON (dual-engine)") {
    // JSON-side default application mirroring CodeGen.hs:342-350
    def fill(v: JValue, s: graft.spec.SchemaSpec): JValue = v match {
      case JObject(fields) =>
        val m = fields.toMap
        val out = s.properties.toSeq.sortBy(_._1).flatMap { case (name, sub) =>
          m.get(name) match {
            case Some(JNull) | None =>
              sub.default.map(d => name -> fill(d, sub))
                .orElse(m.get(name).map(name -> _))
            case Some(x) => Some(name -> fill(x, sub))
          }
        } ++ fields.filterNot { case (k, _) => s.properties.contains(k) }
        JObject(out.toList)
      case other => other
    }

    val rowsJson: Seq[JValue] = Seq(
      JObject(List("a" -> JInt(15), "b" -> JString("hello"), "c" -> JInt(1),
        "nest" -> JObject(List("x" -> JInt(1), "y" -> JString("q"))))),
      JObject(List("nest" -> JObject(List("y" -> JString("z"))))),
      JObject(List("b" -> JString("okay"), "c" -> JInt(2))))

    val engine = ValidationEngine.annotate(ValidationEngine.applyDefaults(df, spec), spec)
      .select(col(ValidationEngine.PassCol)).as[Boolean].collect().toSeq
    val oracle = rowsJson.map(j => OracleValidator.isValid(Map.empty, spec, fill(j, spec)))
    assert(engine == oracle)
    // and the defaulted rows actually PASS (42 >= 10, "fallback" length >= 3)
    assert(engine == Seq(true, true, true))

    // a default that itself violates its sibling constraints still gets
    // validated — defaults are data, not exemptions (both engines agree)
    val badSpec = SchemaParser.parse(
      """{"type":"object","properties":{"a":{"type":"integer","default":3,"minimum":10}}}""")
    val one = spark.createDataFrame(
      java.util.Collections.singletonList(Row(null.asInstanceOf[Any])),
      StructType(Seq(StructField("a", LongType, nullable = true))))
    val eng = ValidationEngine.annotate(ValidationEngine.applyDefaults(one, badSpec), badSpec)
      .select(col(ValidationEngine.PassCol)).as[Boolean].head()
    val orc = OracleValidator.isValid(Map.empty, badSpec,
      fill(JObject(Nil), badSpec))
    assert(!eng && eng == orc)
  }

  test("defaults reach array elements: struct fields inside items, null elements") {
    val spec2 = SchemaParser.parse(
      """{"type": "object", "properties": {
           "arr":  {"type": "array",
                    "items": {"type": "object",
                              "properties": {"x": {"type": "integer", "default": 7},
                                             "y": {"type": "string"}}}},
           "nums": {"type": "array", "items": {"type": "integer", "default": 5}},
           "tup":  {"type": "array",
                    "items": [{"type": "integer", "default": 1}, {"type": "integer"}]}
         }}""")
    val elemT = StructType(Seq(
      StructField("x", LongType, nullable = true),
      StructField("y", StringType, nullable = true)))
    val schema = StructType(Seq(
      StructField("arr", ArrayType(elemT), nullable = true),
      StructField("nums", ArrayType(LongType), nullable = true),
      StructField("tup", ArrayType(LongType), nullable = true)))
    val df2 = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(Seq(Row(null, "a"), Row(2L, "b")), Seq(null, 3L), Seq(null, null)),
        Row(null, null, null)),
      schema)
    val got = ValidationEngine.applyDefaults(df2, spec2)
      .select("arr", "nums", "tup").collect()
    assert(got(0).getSeq[Row](0) == Seq(Row(7L, "a"), Row(2L, "b")),
      "object items get their property defaults")
    assert(got(0).getSeq[Any](1) == Seq(5L, 3L),
      "null elements take the single-schema element default")
    assert(got(0).getSeq[Any](2) == Seq(1L, null),
      "tuple defaults are positional; positions without a default stay null")
    assert(got(1) == Row(null, null, null), "wholly-absent arrays stay NULL")
  }

  test("defaults reach map values: declared-key fill + insertion, additional-schema recursion") {
    val spec2 = SchemaParser.parse(
      """{"type": "object", "properties": {
           "m": {"type": "object",
                 "properties": {"j": {"type": "integer", "default": 42}},
                 "additionalProperties": {"type": "integer", "default": 9}}
         }}""")
    val schema = StructType(Seq(
      StructField("m", MapType(StringType, LongType), nullable = true)))
    val df2 = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(Map("j" -> null, "k" -> null, "p" -> 3L)), // j,k null values
        Row(Map("k" -> 1L)),                           // j absent → inserted
        Row(null)),                                    // absent map stays NULL
      schema)
    val got = ValidationEngine.applyDefaults(df2, spec2)
      .select("m").collect()
    assert(got(0).getMap[String, Any](0).toMap ==
      Map("j" -> 42L, "k" -> 9L, "p" -> 3L),
      "declared key takes its own default, others the additional-schema default")
    assert(got(1).getMap[String, Any](0).toMap == Map("k" -> 1L, "j" -> 42L),
      "absent declared key is inserted with its default")
    assert(got(2).isNullAt(0), "wholly-absent map stays NULL")

    // dual-engine: validation after defaults agrees with the oracle on
    // the default-filled JSON (j=42 passes minimum, additional 9 fails max 5)
    val vspec = SchemaParser.parse(
      """{"type": "object", "properties": {
           "m": {"type": "object",
                 "properties": {"j": {"type": "integer", "default": 42, "minimum": 10}},
                 "additionalProperties": {"type": "integer", "default": 9, "maximum": 5}}
         }}""")
    val eng = ValidationEngine.annotate(
        ValidationEngine.applyDefaults(df2, vspec), vspec)
      .select(col(ValidationEngine.PassCol)).as[Boolean].collect().toSeq
    val filledJson = Seq(
      JObject(List("m" -> JObject(List("j" -> JInt(42), "k" -> JInt(9), "p" -> JInt(3))))),
      JObject(List("m" -> JObject(List("k" -> JInt(1), "j" -> JInt(42))))),
      JObject(Nil))
    val orc = filledJson.map(j => OracleValidator.isValid(Map.empty, vspec, j))
    assert(eng == orc)
    assert(eng == Seq(false, true, true))
  }
}
