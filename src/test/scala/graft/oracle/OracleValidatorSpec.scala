package graft.oracle

import graft.spec._
import org.scalatest.funsuite.AnyFunSuite

/** Curated semantic examples — re-expressions of the reference's 8 example
  * groups (reference: test/Data/Aeson/Schema/Examples.hs:18-185) over the
  * in-memory oracle. The same truths are asserted against the compiled
  * Spark pipeline in DifferentialSpec (dual-engine sharing, like the
  * reference's Validator/Tests.hs:32 + CodeGen/Tests.hs:301-302).
  */
class OracleValidatorSpec extends AnyFunSuite {

  private def v(json: String) = SchemaParser.parseValue(json)
  private def valid(schema: String, value: String): Boolean =
    OracleValidator.isValid(Map.empty, SchemaParser.parse(schema), v(value))

  test("type checks: primitives") {
    assert(valid("""{"type":"string"}""", "\"abc\""))
    assert(!valid("""{"type":"string"}""", "42"))
    assert(valid("""{"type":"integer"}""", "42"))
    assert(!valid("""{"type":"integer"}""", "4.5"))
    assert(valid("""{"type":"number"}""", "4.5"))
    assert(valid("""{"type":"null"}""", "null"))
    assert(valid("""{"type":"any"}""", "[1,2]"))
  }

  test("string keywords: lengths, pattern, format regex") {
    val s = """{"type":"string","minLength":2,"maxLength":4,"pattern":"^a"}"""
    assert(valid(s, "\"ab\""))
    assert(!valid(s, "\"a\""))       // too short
    assert(!valid(s, "\"abcde\""))   // too long
    assert(!valid(s, "\"xbcd\""))    // pattern
    assert(valid("""{"type":"string","format":"regex"}""", "\"[a-z]+\""))
    assert(!valid("""{"type":"string","format":"regex"}""", "\"[unclosed\""))
    // non-regex formats are no-ops in the reference
    assert(valid("""{"type":"string","format":"date-time"}""", "\"not a date\""))
  }

  test("numeric keywords: bounds, exclusive flags, exact divisibleBy") {
    val s = """{"type":"number","minimum":1,"maximum":10}"""
    assert(valid(s, "1") && valid(s, "10") && !valid(s, "0.5") && !valid(s, "10.5"))
    val ex = """{"type":"number","minimum":1,"exclusiveMinimum":true,
                 "maximum":10,"exclusiveMaximum":true}"""
    assert(!valid(ex, "1") && !valid(ex, "10") && valid(ex, "5"))
    // exact decimal divisibility, no float error (Helpers.hs:59-67)
    assert(valid("""{"type":"number","divisibleBy":0.0001}""", "0.0075"))
    assert(!valid("""{"type":"number","divisibleBy":0.0002}""", "0.0075"))
    assert(valid("""{"type":"integer","divisibleBy":2}""", "4"))
    assert(!valid("""{"type":"integer","divisibleBy":2}""", "5"))
  }

  test("enum is deep structural equality") {
    val s = """{"enum":["a",1,[1,2]]}"""
    assert(valid(s, "\"a\"") && valid(s, "1") && valid(s, "[1,2]"))
    assert(!valid(s, "\"b\"") && !valid(s, "[2,1]"))
    assert(valid("""{"enum":[1]}""", "1.0")) // numeric value equality
  }

  test("arrays: items bounds, uniqueItems, tuple + additionalItems") {
    val s = """{"type":"array","minItems":1,"maxItems":3,
               "items":{"type":"integer","minimum":0}}"""
    assert(valid(s, "[0,1,2]"))
    assert(!valid(s, "[]"))          // minItems
    assert(!valid(s, "[1,2,3,4]"))   // maxItems
    assert(!valid(s, "[1,-2]"))      // element minimum
    assert(!valid(s, "[1,\"x\"]"))   // element type

    val u = """{"type":"array","uniqueItems":true}"""
    assert(valid(u, "[1,2,3]") && !valid(u, "[1,2,1]"))
    assert(!valid(u, """[{"a":1},{"a":1}]""")) // structural duplicate

    val t = """{"type":"array",
               "items":[{"type":"string"},{"type":"integer"}],
               "additionalItems":false}"""
    assert(valid(t, """["a",1]"""))
    assert(valid(t, """["a"]"""))          // missing positions are optional
    assert(!valid(t, """["a",1,2]"""))     // additionalItems: false
    assert(!valid(t, """[1,1]"""))         // wrong positional type
    val ts = """{"type":"array","items":[{"type":"string"}],
                "additionalItems":{"type":"integer"}}"""
    assert(valid(ts, """["a",1,2]""") && !valid(ts, """["a",1,"b"]"""))
  }

  test("objects: properties, required, null satisfies required") {
    val s = """{"type":"object","properties":{
                "a":{"type":"integer","required":true},
                "b":{"type":"string"}}}"""
    assert(valid(s, """{"a":1}"""))
    assert(!valid(s, """{"b":"x"}"""))       // a missing
    assert(valid(s, """{"a":null}""") == false) // null fails the integer type…
    // …but presence-wise, required alone is satisfied by null:
    val req = """{"type":"object","properties":{"a":{"required":true}}}"""
    assert(valid(req, """{"a":null}"""))
    assert(!valid(req, """{}"""))
  }

  test("patternProperties compose with properties; additionalProperties") {
    val s = """{"type":"object",
               "properties":{"positiveNumber":{"type":"number","minimum":0,"exclusiveMinimum":true}},
               "patternProperties":{".+Number$":{"type":"number"}},
               "additionalProperties":false}"""
    assert(valid(s, """{"positiveNumber":5,"oddNumber":3}"""))
    assert(!valid(s, """{"positiveNumber":-5}"""))       // both rules apply
    assert(!valid(s, """{"positiveNumber":5,"x":1}"""))  // additionalProperties
    val ap = """{"type":"object","additionalProperties":{"type":"integer"}}"""
    assert(valid(ap, """{"x":1}""") && !valid(ap, """{"x":"y"}"""))
  }

  test("dependencies: property and schema forms") {
    val p = """{"type":"object","dependencies":{"a":["b","c"]}}"""
    assert(valid(p, """{"a":1,"b":2,"c":3}"""))
    assert(!valid(p, """{"a":1,"b":2}"""))
    assert(valid(p, """{"b":2}"""))   // trigger absent
    val sc = """{"type":"object","dependencies":{
                 "a":{"properties":{"b":{"type":"integer","required":true}}}}}"""
    assert(valid(sc, """{"a":1,"b":2}"""))
    assert(!valid(sc, """{"a":1}"""))
    assert(valid(sc, """{"b":"s"}""")) // no trigger, subschema not applied
  }

  test("disallow: type and subschema forms") {
    val d = """{"disallow":"integer"}"""
    assert(!valid(d, "3") && valid(d, "3.5") && valid(d, "\"x\""))
    val ds = """{"type":"object","disallow":[{"properties":{"a":{"type":"integer","required":true}}}]}"""
    assert(!valid(ds, """{"a":1}"""))  // matches disallowed schema
    assert(valid(ds, """{"a":"s"}""")) // disallowed schema rejects it → ok
  }

  test("extends is conjunction with base schemas") {
    val s = """{"type":"object",
               "properties":{"a":{"type":"integer"}},
               "extends":{"properties":{"a":{"minimum":3}}}}"""
    assert(valid(s, """{"a":5}"""))
    assert(!valid(s, """{"a":1}"""))   // base minimum
    assert(!valid(s, """{"a":"x"}""")) // own type
  }

  test("union types: pass iff any alternative is clean") {
    val s = """{"type":["string","integer"]}"""
    assert(valid(s, "\"x\"") && valid(s, "3") && !valid(s, "3.5") && !valid(s, "[1]"))
    val sub = """{"type":["integer",{"type":"string","minLength":2}]}"""
    assert(valid(sub, "3") && valid(sub, "\"ab\"") && !valid(sub, "\"a\""))
  }

  test("$ref delegates through the graph") {
    val g = SchemaParser.parseGraph(
      """{"a":{"$ref":"b"},"b":{"type":"integer","minimum":3}}""")
    assert(OracleValidator.isValid(g, g("a"), v("5")))
    assert(!OracleValidator.isValid(g, g("a"), v("1")))
    assert(!OracleValidator.isValid(g, g("a"), v("\"x\"")))
  }

  test("all violations accumulate (no short-circuit)") {
    val s = SchemaParser.parse(
      """{"type":"string","minLength":5,"pattern":"^a"}""")
    val errs = OracleValidator.validate(Map.empty, s, v("\"xy\""))
    assert(errs.map(_.cid).toSet == Set("$.minLength", "$.pattern"))
  }
}
