package graft.spec

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._

class SchemaParserSpec extends AnyFunSuite {

  test("empty schema takes all draft-3 defaults") {
    val s = SchemaParser.parse("{}")
    assert(s == SchemaSpec.empty)
    assert(s.types == Seq(Left(SchemaType.SAny)))
    assert(s.additionalProperties == Left(true))
    assert(!s.required && s.minItems == 0 && s.minLength == 0)
  }

  test("type accepts single value or array (singleOrArray)") {
    assert(SchemaParser.parse("""{"type":"string"}""").types ==
      Seq(Left(SchemaType.SString)))
    assert(SchemaParser.parse("""{"type":["string","number"]}""").types ==
      Seq(Left(SchemaType.SString), Left(SchemaType.SNumber)))
    // nested subschema as a type alternative
    val u = SchemaParser.parse("""{"type":["string",{"type":"integer","minimum":3}]}""")
    assert(u.types.head == Left(SchemaType.SString))
    assert(u.types(1).toOption.get.minimum.contains(BigDecimal(3)))
  }

  test("numbers parse exactly as BigDecimal") {
    val s = SchemaParser.parse("""{"divisibleBy":0.0001,"minimum":1e-3}""")
    assert(s.divisibleBy.contains(BigDecimal("0.0001")))
    assert(s.minimum.contains(BigDecimal("0.001")))
  }

  test("dependencies: string, array, and schema forms") {
    val s = SchemaParser.parse(
      """{"dependencies":{"a":"b","c":["d","e"],"f":{"type":"object"}}}""")
    assert(s.dependencies("a") == Left(Seq("b")))
    assert(s.dependencies("c") == Left(Seq("d", "e")))
    assert(s.dependencies("f").isRight)
  }

  test("properties / items / additionalProperties parse recursively") {
    val s = SchemaParser.parse(
      """{"type":"object",
         "properties":{"xs":{"type":"array","minItems":1,
           "items":{"type":"integer","minimum":0},
           "additionalItems":false}},
         "additionalProperties":false}""")
    assert(s.additionalProperties == Left(false))
    val xs = s.properties("xs")
    assert(xs.minItems == 1)
    assert(xs.items.get.left.toOption.get.minimum.contains(BigDecimal(0)))
    assert(xs.additionalItems == Left(false))
  }

  test("enum values keep their JSON structure") {
    val s = SchemaParser.parse("""{"enum":["a",1,[1,2]]}""")
    assert(s.enumValues.get.length == 3)
    assert(s.enumValues.get.head == JString("a"))
  }

  test("$ref graph inlining, siblings ignored, missing ref errors") {
    val g = SchemaParser.parseGraph(
      """{"a":{"$ref":"b","minimum":3},"b":{"type":"integer","maximum":10}}""")
    val inlined = SchemaParser.inline(g, g("a"))
    // delegation is total: a's own minimum is dropped, b's keywords win
    assert(inlined.minimum.isEmpty)
    assert(inlined.maximum.contains(BigDecimal(10)))
    assertThrows[IllegalArgumentException] {
      SchemaParser.inline(Map.empty, SchemaSpec(ref = Some("nope")))
    }
  }

  test("PosixRegex translates POSIX classes to Java equivalents; rejects non-ERE syntax") {
    import java.util.regex.Pattern
    assert(PosixRegex.translate("[[:digit:]]") == "[\\p{Digit}]")
    assert(PosixRegex.translate("^[^[:space:]]+$") == "^[^\\p{Space}]+$")
    assert(PosixRegex.translate("a[[:alpha:]_-]b") == "a[\\p{Alpha}_-]b")
    // classes outside brackets are untouched text
    assert(PosixRegex.translate("x[:y:]z") == "x[:y:]z".replace("[", "[")) // no class context
    // literal '[' inside a bracket is escaped (Java nests classes)
    assert(PosixRegex.translate("[a[b]") == "[a\\[b]")
    // leading ']' is a POSIX literal and gets escaped for Java
    assert(Pattern.compile(PosixRegex.translate("[]x]")).matcher("]").find())
    // semantic checks through compiled Java patterns
    def m(posix: String, s: String) =
      Pattern.compile(PosixRegex.translate(posix)).matcher(s).find()
    assert(m("^[[:xdigit:]]+$", "7fA9"))
    assert(!m("^[[:xdigit:]]+$", "7gA9"))
    assert(m("[[:punct:]]", "a,b"))
    assert(!m("[[:punct:]]", "ab"))
    assertThrows[IllegalArgumentException](PosixRegex.translate("(a)\\1"))
    assertThrows[IllegalArgumentException](PosixRegex.translate("[[.hyphen.]]"))
    assertThrows[IllegalArgumentException](PosixRegex.translate("[[:nope:]]"))
    assertThrows[IllegalArgumentException](PosixRegex.translate("[[:alpha]"))
  }

  test("posix dialect opt-in threads through pattern and patternProperties; default stays Java") {
    val json = """{"type":"object",
      "properties": {"name": {"type":"string", "pattern": "^[[:alpha:]]+$"}},
      "patternProperties": {"^[[:lower:]]+$": {"type":"string"}}}"""
    val posix = SchemaParser.parse(json, PatternDialect.Posix)
    assert(posix.properties("name").pattern.get.source == "^[\\p{Alpha}]+$")
    assert(posix.properties("name").pattern.get.matches("abc"))
    assert(!posix.properties("name").pattern.get.matches("ab1"))
    assert(posix.patternProperties.head._1.matches("abc") &&
      !posix.patternProperties.head._1.matches("Abc"))
    // Java dialect leaves the source untranslated (and silently-different
    // semantics — exactly why posix is opt-in)
    val java = SchemaParser.parse(json)
    assert(java.properties("name").pattern.get.source == "^[[:alpha:]]+$")
  }

  test("recursive $ref unrolls to bounded depth") {
    val g = SchemaParser.parseGraph(
      """{"node":{"type":"object",
          "properties":{"v":{"type":"integer"},"next":{"$ref":"node"}}}}""")
    val s = SchemaParser.inline(g, g("node"), maxDepth = 4)
    // terminates, and some depth of nesting is materialized
    assert(s.properties.contains("next"))
  }
}
