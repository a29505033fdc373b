package graft.compile

import graft.SparkSessionTestWrapper
import graft.oracle.OracleValidator
import graft.spec.SchemaParser
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** Enum deep equality for maps BELOW the top level (round-3 verdict
  * "missing" #1): the reference's enum compares any JSON value
  * structurally at any depth (Validator.hs:47,77) — objects are
  * key-order-insensitive at every nesting level. The compiler
  * canonicalizes every map to its key-sorted entry array recursively
  * (SpecCompiler.mapCanon), so `===` is exact structural equality.
  * Every case is dual-engine: the Catalyst verdict must match the
  * in-memory oracle on the equivalent JSON value.
  */
class EnumDeepEqualitySpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def engineValid(dt: DataType, value: Any, specJson: String): Boolean = {
    val spec = SchemaParser.parse(specJson)
    val cs = SpecCompiler.compileColumn(spec, dt, col("v"), "$")
    val schema = StructType(Seq(StructField("v", dt, nullable = true)))
    val df = spark.createDataFrame(
      java.util.Collections.singletonList(Row(value)), schema)
    val pass = cs.map(c => coalesce(c.pass, lit(false))).reduce(_ && _)
    df.select(pass.as("p")).collect()(0).getBoolean(0)
  }

  private def oracleValid(specJson: String, dataJson: String): Boolean =
    OracleValidator.isValid(Map.empty, SchemaParser.parse(specJson),
      JsonMethods.parse(dataJson, useBigDecimalForDouble = true))

  private def check(dt: DataType, value: Any, dataJson: String,
      specJson: String, want: Boolean): Unit = {
    assert(oracleValid(specJson, dataJson) == want, s"[oracle] $dataJson")
    assert(engineValid(dt, value, specJson) == want, s"[engine] $dataJson")
  }

  test("enum over struct containing a map: key order irrelevant inside the map") {
    val dt = StructType(Seq(
      StructField("tag", StringType),
      StructField("m", MapType(StringType, LongType))))
    val spec = """{"enum": [{"tag": "a", "m": {"x": 1, "y": 2}}]}"""
    def v(tag: String, m: Map[String, Long]) = Row(tag, m)
    check(dt, v("a", Map("y" -> 2L, "x" -> 1L)),
      """{"tag": "a", "m": {"y": 2, "x": 1}}""", spec, want = true)
    check(dt, v("a", Map("x" -> 1L, "y" -> 3L)),
      """{"tag": "a", "m": {"x": 1, "y": 3}}""", spec, want = false)
    check(dt, v("b", Map("x" -> 1L, "y" -> 2L)),
      """{"tag": "b", "m": {"x": 1, "y": 2}}""", spec, want = false)
    check(dt, v("a", Map("x" -> 1L)),
      """{"tag": "a", "m": {"x": 1}}""", spec, want = false)
  }

  test("enum over map of maps: both levels key-order-insensitive") {
    val dt = MapType(StringType, MapType(StringType, LongType))
    val spec = """{"enum": [{"a": {"x": 1, "y": 2}, "b": {"z": 3}}]}"""
    check(dt, Map("b" -> Map("z" -> 3L), "a" -> Map("y" -> 2L, "x" -> 1L)),
      """{"b": {"z": 3}, "a": {"y": 2, "x": 1}}""", spec, want = true)
    check(dt, Map("a" -> Map("x" -> 1L, "y" -> 2L), "b" -> Map("z" -> 4L)),
      """{"a": {"x": 1, "y": 2}, "b": {"z": 4}}""", spec, want = false)
    check(dt, Map("a" -> Map("x" -> 1L, "y" -> 2L)),
      """{"a": {"x": 1, "y": 2}}""", spec, want = false)
  }

  test("enum over array of maps: array order matters, map key order does not") {
    val dt = ArrayType(MapType(StringType, LongType))
    val spec = """{"enum": [[{"x": 1, "y": 2}, {"z": 3}]]}"""
    check(dt, Seq(Map("y" -> 2L, "x" -> 1L), Map("z" -> 3L)),
      """[{"y": 2, "x": 1}, {"z": 3}]""", spec, want = true)
    check(dt, Seq(Map("z" -> 3L), Map("x" -> 1L, "y" -> 2L)),
      """[{"z": 3}, {"x": 1, "y": 2}]""", spec, want = false)
    check(dt, Seq(Map("x" -> 1L, "y" -> 2L)),
      """[{"x": 1, "y": 2}]""", spec, want = false)
  }

  test("unrepresentable enum values are skipped, not errors (constant non-match)") {
    val dt = StructType(Seq(StructField("m", MapType(StringType, LongType))))
    // second allowed value has a string map value — not representable in
    // map<string,long>, so it can never match this column
    val spec = """{"enum": [{"m": {"x": 1}}, {"m": {"x": "s"}}]}"""
    check(dt, Row(Map("x" -> 1L)), """{"m": {"x": 1}}""", spec, want = true)
    check(dt, Row(Map("x" -> 2L)), """{"m": {"x": 2}}""", spec, want = false)
  }

  test("null struct / null nested map fail a non-null enum") {
    val dt = StructType(Seq(
      StructField("tag", StringType),
      StructField("m", MapType(StringType, LongType))))
    val spec = """{"enum": [{"tag": "a", "m": {"x": 1}}]}"""
    assert(!engineValid(dt, null, spec))
    assert(!engineValid(dt, Row("a", null), spec))
  }
}
