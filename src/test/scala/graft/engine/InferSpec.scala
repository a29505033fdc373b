package graft.engine

import graft.SparkSessionTestWrapper
import graft.spec.{SchemaParser, SchemaRender, SchemaSpec, SchemaType, SPattern}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.scalatest.funsuite.AnyFunSuite

/** Constraint suggestion ([[SpecInfer]]) + the spec renderer
  * ([[SchemaRender]]): the `infer → render → parse → compile → validate`
  * loop must close — the emitted spec is a real draft-3 document that
  * re-parses to the same spec and validates the profiled table with
  * zero violations, while rows outside the observed envelope trip it.
  */
class InferSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private lazy val df = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("lang", StringType, nullable = true),
      StructField("score", DoubleType, nullable = true),
      StructField("flag", BooleanType, nullable = true),
      StructField("toks", ArrayType(IntegerType), nullable = true)))
    val rows = (0 until 200).map { i =>
      Row(i.toLong, s"n$i", Seq("en", "de", "fr")(i % 3),
        1.5 + (i % 7) * 0.25, i % 2 == 0,
        Seq(i % 50, 10 + i % 40, 25))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
  }

  test("render/parse round trip is identity on parsed-normal specs") {
    val handWritten =
      """{
        "type": "object",
        "properties": {
          "a": {"type": "integer", "required": true, "minimum": 0, "maximum": 10,
                "divisibleBy": 2, "default": 4},
          "b": {"type": "string", "pattern": "^x", "minLength": 1, "maxLength": 5,
                "enum": ["x1", "x2"]},
          "c": {"type": "array", "minItems": 1, "maxItems": 3, "uniqueItems": true,
                "items": [{"type": "integer"}, {"type": "string"}],
                "additionalItems": false},
          "d": {"type": ["integer", "string"], "disallow": "null"}
        },
        "patternProperties": {"^p_": {"type": "number", "exclusiveMinimum": true, "minimum": 0}},
        "additionalProperties": false,
        "dependencies": {"a": "b", "b": ["a", "c"], "c": {"type": "object"}},
        "extends": [{"type": "object"}]
      }"""
    val spec = SchemaParser.parse(handWritten)
    assert(SchemaParser.parse(SchemaRender.compact(spec)) == spec)

    val inferred = SpecInfer.infer(df)
    assert(SchemaParser.parse(SchemaRender.compact(inferred)) == inferred)
  }

  test("inferred spec validates its own table with zero violations") {
    val spec = SpecInfer.infer(df)
    val ann = ValidationEngine.annotate(df, spec)
    assert(ann.where(!col("valid")).count() == 0L)
    // and it carries the observed invariants, not just `any`
    val p = spec.properties
    assert(p("id").required && p("id").types == Seq(Left(SchemaType.SInteger)))
    assert(p("id").minimum.contains(BigDecimal(0)) && p("id").maximum.contains(BigDecimal(199)))
    assert(p("lang").enumValues.map(_.toList).contains(List(JString("de"), JString("en"), JString("fr"))))
    assert(!p("name").enumValues.isDefined) // 200 distinct names: no enum
    assert(p("name").minLength == 2 && p("name").maxLength.contains(4))
    assert(p("score").types == Seq(Left(SchemaType.SNumber)))
    assert(p("flag").types == Seq(Left(SchemaType.SBoolean)))
    assert(p("toks").minItems == 3 && p("toks").maxItems.contains(3))
    val items = p("toks").items.get.left.toOption.get
    assert(items.minimum.contains(BigDecimal(0)) && items.maximum.contains(BigDecimal(49)))
  }

  test("rows outside the observed envelope trip the inferred spec") {
    val spec = SpecInfer.infer(df)
    val bad = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(500L, "toolongname", "en", 2.0, true, Seq(1, 2, 3)),   // id > max, name len > max
        Row(7L, "n7", "zz", 2.0, true, Seq(1, 2, 3)),              // lang outside enum
        Row(8L, "n8", "en", 2.0, true, Seq(60, 2, 3)),             // element > items max
        Row(null, "n9", "en", 2.0, true, Seq(1, 2, 3)))            // required id null
        .map(r => r: Row), 1),
      df.schema.copy(fields = df.schema.fields.map(_.copy(nullable = true))))
    val viol = ValidationEngine.annotate(bad, spec).where(!col("valid")).count()
    assert(viol == 4L)
  }

  test("inferRows carries the evidence; HLL gate keeps collect_set off high-cardinality columns") {
    val rows = SpecInfer.inferRows(df.select("id", "name", "lang"), enumMax = 8)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("id").getLong(1) == 200L)       // n
    assert(rows("id").getLong(2) == 0L)         // n_null
    assert(rows("id").getBoolean(3))            // required
    assert(rows("lang").getLong(6) == 3L)       // n_distinct
    assert(rows("lang").getString(7) == "de,en,fr")
    assert(rows("name").isNullAt(7))            // 200 distinct: no enum csv

    // high-cardinality string: infer() must not suggest an enum (the HLL
    // gate bounds pass 2 before any exact collect runs)
    val spec = SpecInfer.infer(df, enumMax = 8)
    assert(spec.properties("name").enumValues.isEmpty)
    assert(spec.properties("lang").enumValues.isDefined)
  }

  test("bounds=false suggests shape and presence only") {
    val spec = SpecInfer.infer(df, bounds = false)
    val p = spec.properties
    assert(p("id").minimum.isEmpty && p("id").maximum.isEmpty)
    assert(p("name").minLength == 0 && p("name").maxLength.isEmpty)
    assert(p("toks").minItems == 0 && p("toks").maxItems.isEmpty)
    assert(p("id").required)
    assert(ValidationEngine.annotate(df, spec).where(!col("valid")).count() == 0L)
  }
}
