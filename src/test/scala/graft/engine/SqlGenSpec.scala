package graft.engine

import graft.{GraftFunctions, SparkSessionTestWrapper}
import graft.gen.SequenceGen
import graft.spec.SchemaParser
import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite

/** The emitted-SQL artifact (SqlGen, the reference's generateModule
  * analog) must compute exactly what the library computes: for every
  * spec shape, `spark.sql(emitted text)` over a temp view ≡
  * `ValidationEngine.annotate` on the same rows — the same dual-surface
  * discipline the reference applies to its generated modules
  * (reference: test/Data/Aeson/Schema/CodeGen/Tests.hs:304-353).
  */
class SqlGenSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def assertSqlEqualsEngine(df: DataFrame, specJson: String,
      keyCols: Seq[String], view: String): String = {
    val spec = SchemaParser.parse(specJson)
    df.createOrReplaceTempView(view)
    val sqlText = SqlGen.validationSql(spark, spec, df.schema, view, keyCols)
    assert(!sqlText.contains("namedlambdavariable"),
      s"lambda variables must render as identifiers:\n$sqlText")
    assert(!sqlText.contains("lambdafunction("),
      s"lambdas must render as arrow syntax:\n$sqlText")
    val cols = keyCols :+ "valid" :+ "violations"
    def canon(rows: Array[Row]): Seq[String] = rows.map(_.toString).sorted.toSeq
    val got = canon(spark.sql(sqlText).selectExpr(cols: _*).collect())
    val want = canon(ValidationEngine.annotate(df, spec)
      .selectExpr(cols: _*).collect())
    assert(got == want, s"emitted SQL diverged from the engine:\n$sqlText")
    sqlText
  }

  test("emitted SQL ≡ engine on the sequence spec (pattern, enum, array items, bounds)") {
    val specJson =
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
    val df = SequenceGen.generate(spark, 3000)
    val sqlText = assertSqlEqualsEngine(df, specJson, Seq("doc_id"), "sqlgen_seq")
    // the artifact found real violations (non-degenerate check)
    assert(spark.sql(sqlText).where("NOT valid").count() > 0)
  }

  test("emitted SQL ≡ engine on tuple items, additionalItems false, uniqueItems, divisibleBy") {
    val specJson =
      """{
        "type": "object",
        "properties": {
          "id": {"type": "integer", "required": true, "divisibleBy": 3},
          "pair": {"type": "array",
                   "items": [{"type": "integer", "minimum": 0},
                             {"type": "integer", "maximum": 10}],
                   "additionalItems": false},
          "tags": {"type": "array", "uniqueItems": true}
        }
      }"""
    val df = Seq(
      (0L, Seq(1, 2), Seq("a", "b")),
      (1L, Seq(-1, 2), Seq("a", "a")),
      (5L, Seq(1, 11, 99), Seq("x")),
      (9L, Seq(0, 10), Seq())
    ).toDF("id", "pair", "tags")
    assertSqlEqualsEngine(df, specJson, Seq("id"), "sqlgen_tuple")
  }

  test("emitted SQL ≡ engine on struct-typed enum literals (deep equality)") {
    val specJson =
      """{
        "type": "object",
        "properties": {
          "id": {"type": "integer", "required": true},
          "meta": {"type": "object",
                   "enum": [{"k": "a", "v": 1}, {"k": "b", "v": 2}]}
        }
      }"""
    val df = Seq(
      (0L, ("a", 1)),
      (1L, ("b", 2)),
      (2L, ("a", 2)),
      (3L, ("z", 9))
    ).toDF("id", "meta_raw")
      .selectExpr("id", "named_struct('k', meta_raw._1, 'v', meta_raw._2) AS meta")
    assertSqlEqualsEngine(df, specJson, Seq("id"), "sqlgen_enum_struct")
  }

  test("emitted SQL ≡ engine on format:regex via the registered graft_is_valid_regex") {
    GraftFunctions.register(spark)
    val specJson =
      """{
        "type": "object",
        "properties": {
          "id": {"type": "integer", "required": true},
          "pat": {"type": "string", "format": "regex"}
        }
      }"""
    val df = Seq((0L, "^a+$"), (1L, "(unclosed"), (2L, "[a-z]{2,}")).toDF("id", "pat")
    assertSqlEqualsEngine(df, specJson, Seq("id"), "sqlgen_format")
  }

  test("emitted SQL ≡ engine on a user-registered format (pluggable registry, rendered by its sqlName)") {
    val entry = graft.compile.FormatRegistry.register("sqlgen-upper",
      s => s == s.toUpperCase)
    GraftFunctions.register(spark) // installs graft_format_sqlgen_upper
    val specJson =
      """{
        "type": "object",
        "properties": {
          "id": {"type": "integer", "required": true},
          "code": {"type": "string", "format": "sqlgen-upper"}
        }
      }"""
    val df = Seq((0L, "ABC"), (1L, "AbC"), (2L, "X1")).toDF("id", "code")
    val sql = SqlGen.validationSql(spark, graft.spec.SchemaParser.parse(specJson),
      df.schema, "sqlgen_custom_fmt", Seq("id"))
    assert(sql.contains(s"${entry.sqlName}("),
      s"emitted SQL must reference the registered name ${entry.sqlName}:\n$sql")
    assertSqlEqualsEngine(df, specJson, Seq("id"), "sqlgen_custom_fmt")
  }

  test("emitted SQL ≡ engine on arbitrary-precision divisibleBy via graft_divisible_by") {
    GraftFunctions.register(spark)
    val specJson =
      """{
        "type": "object",
        "properties": {
          "id": {"type": "integer", "required": true},
          "v": {"type": "number", "divisibleBy": 1.23e-41}
        }
      }"""
    val df = Seq((0L, 2.46e-41), (1L, 2.5e-41), (2L, 0.0)).toDF("id", "v")
    val sql = assertSqlEqualsEngine(df, specJson, Seq("id"), "sqlgen_divis_exact")
    assert(sql.contains("graft_divisible_by("),
      s"the >38-digit divisor must render through the registered function:\n$sql")
  }

  test("emitted SQL ≡ engine on MapType object semantics (patternProperties, additionalProperties)") {
    val specJson =
      """{
        "type": "object",
        "properties": {
          "id": {"type": "integer", "required": true},
          "attrs": {"type": "object",
                    "patternProperties": {"^n_": {"type": "string", "minLength": 2}},
                    "additionalProperties": false}
        }
      }"""
    val df = Seq(
      (0L, Map("n_a" -> "ok", "n_b" -> "yes")),
      (1L, Map("n_a" -> "x")),
      (2L, Map("other" -> "zz")),
      (3L, Map.empty[String, String])
    ).toDF("id", "attrs")
    assertSqlEqualsEngine(df, specJson, Seq("id"), "sqlgen_map")
  }

  test("specs with defaults emit the defaults projection (artifact ≡ applyDefaults + annotate)") {
    import org.apache.spark.sql.types._
    val specJson =
      """{
        "type": "object",
        "properties": {
          "id":   {"type": "integer", "required": true},
          "lang": {"type": "string", "default": "zz", "enum": ["en", "de"]},
          "xs":   {"type": "array", "items": {"type": "integer", "default": 0, "minimum": 1}}
        }
      }"""
    val spec = SchemaParser.parse(specJson)
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("lang", StringType, nullable = true),
      StructField("xs", ArrayType(LongType), nullable = true)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "en", Seq(2L, 3L)),
        Row(2L, null, Seq(null, 5L)), // lang → "zz" (enum viol), xs[0] → 0 (min viol)
        Row(3L, "de", null)),
      schema)
    df.createOrReplaceTempView("sqlgen_defaults")
    val sqlText = SqlGen.validationSql(spark, spec, df.schema, "sqlgen_defaults", Seq("id"))
    val cols = Seq("id", "valid", "violations")
    def canon(rows: Array[Row]): Seq[String] = rows.map(_.toString).sorted.toSeq
    val got = canon(spark.sql(sqlText).selectExpr(cols: _*).collect())
    val want = canon(ValidationEngine.annotate(
        ValidationEngine.applyDefaults(df, spec), spec)
      .selectExpr(cols: _*).collect())
    assert(got == want, s"emitted SQL diverged from applyDefaults+annotate:\n$sqlText")
    // non-degenerate: without the defaults layer the verdicts would differ
    // (a NULL lang passes the enum guard; filled "zz" fails it)
    val noDefaults = ValidationEngine.annotate(df, spec)
      .selectExpr(cols: _*).collect()
    assert(canon(noDefaults) != got)
    assert(spark.sql(sqlText).where("NOT valid").count() == 1)
  }

  test("posix-dialect spec emits the translated pattern, runnable on stock SQL") {
    val spec = SchemaParser.parse(
      """{"type": "object", "properties": {
           "id": {"type": "integer", "required": true},
           "s":  {"type": "string", "pattern": "^[[:digit:]]+$"}}}""",
      graft.spec.PatternDialect.Posix)
    val df = Seq((1L, "123"), (2L, "12a"), (3L, "007")).toDF("id", "s")
    df.createOrReplaceTempView("sqlgen_posix")
    val sqlText = SqlGen.validationSql(spark, spec, df.schema, "sqlgen_posix", Seq("id"))
    assert(!sqlText.contains("[[:"),
      s"the raw POSIX class must be translated for the Java-regex surface:\n$sqlText")
    val bad = spark.sql(sqlText).where("NOT valid").selectExpr("id").collect()
    assert(bad.map(_.getLong(0)).toSet == Set(2L))
  }

  test("the artifact runs as a CREATE VIEW (no library code on the query path)") {
    val df = Seq((1L, 5), (2L, -3)).toDF("id", "n")
    val spec = SchemaParser.parse(
      """{"type": "object", "properties": {
           "id": {"type": "integer", "required": true},
           "n": {"type": "integer", "minimum": 0}}}""")
    df.createOrReplaceTempView("sqlgen_view_src")
    val sqlText = SqlGen.validationSql(spark, spec, df.schema, "sqlgen_view_src", Seq("id"))
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW sqlgen_verdicts AS $sqlText")
    val bad = spark.sql(
      "SELECT id, v.constraint_id FROM sqlgen_verdicts " +
      "LATERAL VIEW explode(violations) t AS v WHERE NOT valid").collect()
    assert(bad.map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((2L, "$.n.minimum")))
  }
}
