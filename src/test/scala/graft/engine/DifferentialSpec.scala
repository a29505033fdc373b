package graft.engine

import graft.SparkSessionTestWrapper
import graft.gen.SequenceGen
import graft.oracle.OracleValidator
import graft.spec.SchemaParser
import org.apache.spark.sql.Row
import org.json4s._
import org.scalatest.funsuite.AnyFunSuite

/** Layer-3 differential testing (SURVEY.md §5): the Catalyst-compiled
  * pipeline and the in-memory oracle must agree on verdicts AND exact
  * violation sets for every row — the reference runs the same dual-engine
  * comparison between its interpreter and its generated parsers
  * (reference: test/Data/Aeson/Schema/CodeGen/Tests.hs:304-353).
  */
class DifferentialSpec extends AnyFunSuite with SparkSessionTestWrapper {

  val specJson: String =
    s"""{
      "type": "object",
      "properties": {
        "doc_id": {"type": "string", "required": true,
                   "pattern": "^d[0-9]{10}$$", "minLength": 11, "maxLength": 11},
        "tokens": {"type": "array", "required": true, "minItems": 1,
                   "items": {"type": "integer", "minimum": 0,
                             "maximum": ${SequenceGen.Vocab - 1}}},
        "n_tok":  {"type": "integer", "required": true, "minimum": 1},
        "source": {"type": "string", "required": true,
                   "enum": [${SequenceGen.Sources.map(s => "\"" + s + "\"").mkString(",")}]}
      }
    }"""

  private def rowToJson(r: Row): JValue = {
    val fields = scala.collection.mutable.ListBuffer[(String, JValue)]()
    // SQL NULL = absent (the documented null/undefined collapse, SURVEY.md §7.4)
    if (!r.isNullAt(r.fieldIndex("doc_id")))
      fields += "doc_id" -> JString(r.getAs[String]("doc_id"))
    if (!r.isNullAt(r.fieldIndex("tokens")))
      fields += "tokens" -> JArray(
        r.getAs[scala.collection.Seq[Int]]("tokens").map(t => JInt(BigInt(t))).toList)
    if (!r.isNullAt(r.fieldIndex("n_tok")))
      fields += "n_tok" -> JInt(BigInt(r.getAs[Int]("n_tok")))
    if (!r.isNullAt(r.fieldIndex("source")))
      fields += "source" -> JString(r.getAs[String]("source"))
    JObject(fields.toList)
  }

  test("compiled pipeline ≡ oracle: verdicts and exact violation sets, 4000 rows") {
    val spec = SchemaParser.parse(specJson)
    val df = SequenceGen.generate(spark, 4000)
    val ann = ValidationEngine.annotate(df, spec).collect()
    assert(ann.length == 4000)
    var failures = 0L
    ann.foreach { r =>
      val expected = OracleValidator
        .validate(Map.empty, spec, rowToJson(r)).map(_.cid).toSet
      val got = r.getAs[scala.collection.Seq[Row]](ValidationEngine.ViolationsCol)
        .map(_.getString(0)).toSet
      assert(got == expected,
        s"row doc_id=${r.getAs[String]("doc_id")} n_tok=${r.getAs[Int]("n_tok")}: engine=$got oracle=$expected")
      if (expected.nonEmpty) failures += 1
    }
    // the generator injects violations — make sure the test isn't vacuous
    assert(failures > 0, "expected some injected violations")
    assert(failures < 4000, "expected mostly-clean data")
  }

  test("every injected defect class is caught with the right constraint id") {
    val spec = SchemaParser.parse(specJson)
    val df = SequenceGen.generate(spark, 4000)
    val byCid = ValidationEngine.violations(df, spec, Seq("doc_id"))
      .collect().map(r => r.getString(1)).groupBy(identity).view.mapValues(_.length).toMap
    assert(byCid.contains("$.doc_id.required"))    // null doc_id
    assert(byCid.contains("$.doc_id.pattern"))     // BAD~ ids
    assert(byCid.contains("$.tokens[*].maximum"))  // out-of-vocab token
    assert(byCid.contains("$.tokens.minItems"))    // empty tokens
    assert(byCid.contains("$.n_tok.minimum"))      // n_tok 0 on empty tokens
    assert(byCid.contains("$.source.enum"))        // src_unknown
  }

  test("token-array equality: arrays pass through the engine byte-equal") {
    val df = SequenceGen.generate(spark, 1000)
    val spec = SchemaParser.parse(specJson)
    val in = df.collect().map(r =>
      Option(r.getAs[String]("doc_id")) -> r.getAs[scala.collection.Seq[Int]]("tokens"))
    val out = ValidationEngine.annotate(df, spec).collect().map(r =>
      Option(r.getAs[String]("doc_id")) -> r.getAs[scala.collection.Seq[Int]]("tokens"))
    assert(in.sortBy(_._1.getOrElse("")).zip(out.sortBy(_._1.getOrElse("")))
      .forall { case ((k1, t1), (k2, t2)) => k1 == k2 && t1 == t2 })
  }

  test("generator is parallelism-independent (splittable seeding)") {
    val a = SequenceGen.generate(spark, 500).repartition(1).orderBy("doc_id").collect()
    val b = SequenceGen.generate(spark, 500).repartition(7).orderBy("doc_id").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }
}
