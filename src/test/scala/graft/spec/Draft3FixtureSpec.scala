package graft.spec

import graft.{JsonData, SparkSessionTestWrapper}
import graft.oracle.OracleValidator
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** Vendored draft-3 conformance corpus (FIXTURES.md §1), one file per
  * keyword in the exact format the reference's test suite consumes
  * (reference: test/TestSuite/Types.hs:23-45; the upstream
  * JSON-Schema-Test-Suite submodule is empty in-sandbox, see
  * .gitmodules:1-3). Pass criterion identical to the reference
  * (Validator/Tests.hs:24-29): zero violations ⇔ `valid`.
  *
  * Every case runs against BOTH engines (oracle + Catalyst), plus the
  * MapType specialization when the object is homogeneous. Extensions to
  * the upstream format, both optional per group/test:
  *   - `graph`: named schemas for `$ref` resolution
  *   - `engineSkip`: JSON-level verdict depends on null≠absent, which
  *     SQL NULL cannot represent (documented collapse, SURVEY.md §7.4)
  *   - `dialect` (group-level): `"posix"` parses the group's patterns as
  *     POSIX ERE via the opt-in translation (SURVEY.md §7.3) — both
  *     engines then execute the translated pattern
  */
class Draft3FixtureSpec extends AnyFunSuite with SparkSessionTestWrapper {

  // the format.json fixture's custom-format group exercises the
  // pluggable registry on both engines (only "regex" ships registered)
  graft.compile.FormatRegistry.register("even-length", s => s.length % 2 == 0)

  private val files = Seq(
    "type", "properties", "patternProperties", "additionalProperties",
    "items", "additionalItems", "required", "dependencies",
    "minimum", "maximum", "minItems", "maxItems", "uniqueItems",
    "pattern", "minLength", "maxLength", "enum", "divisibleBy",
    "disallow", "extends", "ref", "format")

  private def load(name: String): JValue = {
    val in = getClass.getResourceAsStream(s"/draft3/$name.json")
    require(in != null, s"missing fixture resource draft3/$name.json")
    try JsonMethods.parse(
      new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8),
      useBigDecimalForDouble = true)
    finally in.close()
  }

  for (file <- files) test(s"draft3/$file.json conforms on both engines") {
    val JArray(groups) = load(file): @unchecked
    var cases = 0
    groups.foreach { g =>
      val gm = g.asInstanceOf[JObject].obj.toMap
      val desc = gm.get("description").collect { case JString(s) => s }.getOrElse("")
      val dialect = gm.get("dialect") match {
        case Some(JString("posix")) => PatternDialect.Posix
        case _                      => PatternDialect.Java
      }
      val spec = SchemaParser.fromJson(gm("schema"), dialect)
      val graph = gm.get("graph") match {
        case Some(JObject(fields)) =>
          fields.map { case (k, v) => k -> SchemaParser.fromJson(v, dialect) }.toMap
        case _ => Map.empty[String, SchemaSpec]
      }
      val JArray(tests) = gm("tests"): @unchecked
      tests.foreach { t =>
        val tm = t.asInstanceOf[JObject].obj.toMap
        val tdesc = tm.get("description").collect { case JString(s) => s }.getOrElse("")
        val data = tm("data")
        val JBool(valid) = tm("valid"): @unchecked
        val engineSkip = tm.get("engineSkip").contains(JBool(true))
        val label = s"$file / $desc / $tdesc"

        val inlined = SchemaParser.inline(graph, spec)
        val oracle = OracleValidator.isValid(graph, spec, data)
        assert(oracle == valid, s"[oracle] $label: got $oracle, want $valid")

        if (!engineSkip) {
          JsonData.engineValid(spark, graph, inlined, data) match {
            case Some(engine) =>
              assert(engine == valid, s"[engine] $label: got $engine, want $valid")
            case None =>
              fail(s"[engine] $label: not representable — flag engineSkip or fix JsonData")
          }
          JsonData.engineValidMap(spark, graph, inlined, data).foreach { m =>
            assert(m == valid, s"[engine/map] $label: got $m, want $valid")
          }
        }
        cases += 1
      }
    }
    assert(cases > 0, s"$file.json contains no test cases")
  }
}
