package graft.oracle

import graft.{JsonData, SparkSessionTestWrapper}
import graft.spec.{SchemaParser, SchemaSpec}
import org.json4s.JValue
import org.scalatest.funsuite.AnyFunSuite

/** The reference's 8 curated semantic example groups
  * (reference: test/Data/Aeson/Schema/Examples.hs:18-185), asserted
  * against BOTH engines: the in-memory oracle and the Catalyst-compiled
  * pipeline — the same dual-engine sharing the reference applies
  * (Validator/Tests.hs:32 and CodeGen/Tests.hs:301-302). Cases whose
  * verdict depends on distinguishing a present JSON null from an absent
  * property are oracle-only (the documented SQL-NULL collapse,
  * SURVEY.md §7.4).
  */
class ExamplesSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def schema(json: String): SchemaSpec = SchemaParser.parse(json)
  private def value(json: String): JValue = SchemaParser.parseValue(json)

  private def assertBoth(graph: Map[String, SchemaSpec], s: SchemaSpec,
      dataJson: String, valid: Boolean): Unit = {
    val data = value(dataJson)
    val oracle = OracleValidator.isValid(graph, s, data)
    assert(oracle == valid, s"oracle verdict for $dataJson: got $oracle, want $valid")
    JsonData.engineValid(spark, graph, s, data) match {
      case Some(engine) =>
        assert(engine == valid, s"engine verdict for $dataJson: got $engine, want $valid")
      case None =>
        fail(s"expected $dataJson to be engine-representable")
    }
  }

  private def assertBoth(s: SchemaSpec, dataJson: String, valid: Boolean): Unit =
    assertBoth(Map.empty, s, dataJson, valid)

  /** JSON-level verdict needs null≠absent (or a top-level null), which
    * SQL NULL cannot represent: assert the oracle only.
    */
  private def assertOracleOnly(s: SchemaSpec, dataJson: String, valid: Boolean): Unit = {
    val oracle = OracleValidator.isValid(Map.empty, s, value(dataJson))
    assert(oracle == valid, s"oracle verdict for $dataJson: got $oracle, want $valid")
  }

  test("patternProperties (Examples.hs:19-38)") {
    val s = schema("""{
      "type": "object",
      "properties": {
        "positiveNumber": {"type": "number", "minimum": 0, "exclusiveMinimum": true}
      },
      "patternProperties": {
        ".+Number$": {"type": "integer"},
        ".+String$": {"type": "string"}
      }
    }""")
    assertBoth(s, """{"positiveNumber": 13}""", valid = true)
    assertBoth(s, """{"positiveNumber": -13}""", valid = false)
    assertBoth(s, """{"positiveNumber": 13.5}""", valid = false)
    assertBoth(s, """{"fooString": "foo", "barString": "bar"}""", valid = true)
    // null is a VALUE at JSON level (fails type string), absent in SQL
    assertOracleOnly(s, """{"fooString": null, "barString": "bar"}""", valid = false)
  }

  test("additionalProperties (Examples.hs:39-68)") {
    val additionalNumbers = schema("""{
      "type": "object",
      "properties": {"null": {"type": "null"}},
      "patternProperties": {".+String$": {"type": "string"}},
      "additionalProperties": {"type": "number"}
    }""")
    assertBoth(additionalNumbers,
      """{"null": null, "emptyString": "", "oneMoreThing": 23, "theLastThing": 999}""",
      valid = true)
    assertBoth(additionalNumbers, """{"null": null, "notANumber": true}""", valid = false)

    val noAdditional = schema("""{
      "type": "object",
      "properties": {"null": {"type": "null"}},
      "patternProperties": {".+String$": {"type": "string"}},
      "additionalProperties": false
    }""")
    assertBoth(noAdditional, """{"null": null, "emptyString": ""}""", valid = true)
    assertBoth(noAdditional,
      """{"null": null, "emptyString": "", "oneMoreThing": 23, "theLastThing": 999}""",
      valid = false)
  }

  test("disallow (Examples.hs:69-94)") {
    val onlyFloats = schema("""{"type": "number", "disallow": "integer"}""")
    assertBoth(onlyFloats, "9", valid = false)
    assertBoth(onlyFloats, "9.75", valid = true)

    val notLengthThree = schema("""{
      "type": "array",
      "disallow": [{"type": "array", "minItems": 3, "maxItems": 3}]
    }""")
    assertBoth(notLengthThree, "[]", valid = true)
    assertBoth(notLengthThree, "[1]", valid = true)
    assertBoth(notLengthThree, "[1, 2]", valid = true)
    assertBoth(notLengthThree, "[1, 2, 3]", valid = false)
    assertBoth(notLengthThree, "[1, 2, 3, 4]", valid = true)

    val everythingExceptNumbers = schema("""{"disallow": "number"}""")
    assertBoth(everythingExceptNumbers, "3", valid = false)
    assertBoth(everythingExceptNumbers, "3.5", valid = false)
    assertBoth(everythingExceptNumbers, "true", valid = true)
    assertBoth(everythingExceptNumbers, "\"nobody expects the ...\"", valid = true)
    assertBoth(everythingExceptNumbers, """{"eins": 1, "zwei": 2}""", valid = true)
    assertBoth(everythingExceptNumbers, """["eins", "zwei"]""", valid = true)
    assertOracleOnly(everythingExceptNumbers, "null", valid = true)
  }

  test("type: subschema union (Examples.hs:95-123)") {
    val s = schema("""{
      "type": [
        {"type": "object",
         "properties": {"insert": {"type": "string", "minLength": 1}},
         "additionalProperties": false},
        {"type": "object",
         "properties": {"delete": {"type": "number", "minimum": 1}},
         "additionalProperties": false},
        {"type": "object",
         "properties": {"retain": {"type": "number", "minimum": 1}},
         "additionalProperties": false}
      ]
    }""")
    assertBoth(s, """{"insert": "lorem"}""", valid = true)
    assertBoth(s, """{"insert": "lorem", "delete": 5}""", valid = false)
    assertBoth(s, """{"delete": 5}""", valid = true)
    assertBoth(s, """{"delete": 5, "retain": 76}""", valid = false)
    assertBoth(s, """{"retain": 76}""", valid = true)
  }

  test("dependencies (Examples.hs:124-157)") {
    val aRequiresB = schema("""{"type": "object", "dependencies": {"a": "b"}}""")
    assertBoth(aRequiresB, "{}", valid = true)
    assertBoth(aRequiresB, """{"b": false}""", valid = true)
    assertBoth(aRequiresB, """{"a": true, "b": false}""", valid = true)
    assertBoth(aRequiresB, """{"a": 3}""", valid = false)

    val aRequiresBNumber = schema("""{
      "type": "object",
      "dependencies": {"a": {"properties": {"b": {"type": "number"}}}}
    }""")
    assertBoth(aRequiresBNumber, "{}", valid = true)
    assertBoth(aRequiresBNumber, """{"b": "lorem"}""", valid = true)
    assertBoth(aRequiresBNumber, """{"a": "yes, we can"}""", valid = true)
    assertBoth(aRequiresBNumber, """{"a": "yes, we can", "b": "lorem"}""", valid = false)
    assertBoth(aRequiresBNumber, """{"a": "hi there", "b": 42}""", valid = true)

    val aDisallowsB = schema("""{
      "type": "object",
      "dependencies": {
        "a": {"disallow": [{"properties": {"b": {"type": "any", "required": true}}}]}
      }
    }""")
    assertBoth(aDisallowsB, """{"a": "lorem"}""", valid = true)
    assertBoth(aDisallowsB, """{"b": 42}""", valid = true)
    assertBoth(aDisallowsB, """{"a": "lorem", "b": 42}""", valid = false)
  }

  test("extends (Examples.hs:158-176)") {
    val s = schema("""{
      "type": "object",
      "properties": {"a": {"type": "number"}},
      "extends": [
        {"properties": {"a": {"required": true}}},
        {"patternProperties": {"^[a-z]$": {"minimum": -3}}}
      ]
    }""")
    assertBoth(s, """{"a": 2}""", valid = true)
    assertBoth(s, "{}", valid = false)
    assertBoth(s, """{"a": -4}""", valid = false)
    assertBoth(s, """{"a": "foo"}""", valid = false)
    assertBoth(s, """{"a": -1, "b": -10}""", valid = false)
    assertBoth(s, """{"a": -1, "ba": -10}""", valid = true)
  }

  test("$ref delegation through the graph (Examples.hs:177-184)") {
    val a = schema("""{"$ref": "b", "minimum": 3}""")
    val b = schema("""{"type": "number", "maximum": 2}""")
    val graph = Map("a" -> a, "b" -> b)
    assertBoth(graph, a, "1", valid = true)  // a's own minimum is IGNORED
    assertBoth(graph, a, "4", valid = false) // b's maximum applies
  }
}
