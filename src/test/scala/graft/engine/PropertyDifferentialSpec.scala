package graft.engine

import graft.SparkSessionTestWrapper
import graft.oracle.OracleValidator
import graft.spec._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.json4s._
import org.scalacheck.{Gen => SGen}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Layer-4 property-based differential testing (SURVEY.md §5): random
  * constraint specs × random rows — the compiled Catalyst pipeline must
  * produce exactly the oracle's violation sets. Mirrors the reference's
  * Arbitrary Schema generator (CodeGen/Tests.hs:97-188), specialized to
  * specs satisfiable by the engine's physical row type.
  */
class PropertyDifferentialSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val schema = StructType(Seq(
    StructField("doc_id", StringType),
    StructField("tokens", ArrayType(IntegerType)),
    StructField("n_tok", IntegerType),
    StructField("source", StringType)))

  // --- random spec generator (constraints on the fixed table shape) ---

  private val genStringSpec: SGen[SchemaSpec] = for {
    req <- SGen.oneOf(true, false)
    minL <- SGen.chooseNum(0, 6)
    maxL <- SGen.option(SGen.chooseNum(3, 14))
    pat <- SGen.option(SGen.oneOf("^d", "[0-9]$", "^src", "x", "^d[0-9]+$"))
    en <- SGen.option(SGen.nonEmptyListOf(SGen.oneOf("src0", "src1", "d1", "zz")))
  } yield SchemaSpec(types = Seq(Left(SchemaType.SString)), required = req,
    minLength = minL, maxLength = maxL, pattern = pat.map(SPattern(_)),
    enumValues = en.map(_.map(JString(_))))

  private val genIntSpec: SGen[SchemaSpec] = for {
    req <- SGen.oneOf(true, false)
    min <- SGen.option(SGen.chooseNum(-5, 10))
    max <- SGen.option(SGen.chooseNum(5, 200))
    exMin <- SGen.oneOf(true, false)
    exMax <- SGen.oneOf(true, false)
    div <- SGen.option(SGen.oneOf(2, 3, 7))
  } yield SchemaSpec(types = Seq(Left(SchemaType.SInteger)), required = req,
    minimum = min.map(BigDecimal(_)), maximum = max.map(BigDecimal(_)),
    exclusiveMinimum = exMin, exclusiveMaximum = exMax,
    divisibleBy = div.map(BigDecimal(_)))

  /** Item-level spec: single-primitive-typed (integer) or `any` — the
    * two forms with pinned null-element semantics (SURVEY.md §7.4).
    */
  private val genItemSpec: SGen[SchemaSpec] = SGen.frequency(
    3 -> genIntSpec.map(_.copy(required = false)),
    1 -> genIntSpec.map(_.copy(required = false, types = Seq(Left(SchemaType.SAny)))))

  private val genArraySpec: SGen[SchemaSpec] = for {
    req <- SGen.oneOf(true, false)
    minI <- SGen.chooseNum(0, 3)
    maxI <- SGen.option(SGen.chooseNum(2, 12))
    uniq <- SGen.oneOf(true, false)
    items <- SGen.option(SGen.frequency(
      2 -> genItemSpec.map(s => Left(s): Either[SchemaSpec, Seq[SchemaSpec]]),
      1 -> SGen.listOfN(2, genItemSpec).map(ss => Right(ss): Either[SchemaSpec, Seq[SchemaSpec]])))
    addI <- SGen.frequency[Either[Boolean, SchemaSpec]](
      2 -> SGen.const(Left(true)),
      1 -> SGen.const(Left(false)),
      1 -> genItemSpec.map(Right(_)))
    en <- SGen.option(SGen.someOf(
      JArray(List(JInt(1), JInt(2))), JArray(Nil), JArray(List(JInt(0), JInt(0), JInt(0)))))
  } yield SchemaSpec(types = Seq(Left(SchemaType.SArray)), required = req,
    minItems = minI, maxItems = maxI, uniqueItems = uniq,
    items = items, additionalItems = addI,
    enumValues = en.map(_.toList).filter(_.nonEmpty))

  private val genTableSpec: SGen[SchemaSpec] = for {
    d <- genStringSpec
    t <- genArraySpec
    n <- genIntSpec
    s <- genStringSpec
    // exercise composition keywords on n_tok occasionally
    ext <- SGen.option(genIntSpec.map(_.copy(required = false)))
    dis <- SGen.option(SGen.const(SchemaSpec(types = Seq(Left(SchemaType.SInteger)),
      minimum = Some(BigDecimal(1000)))))
    // union-typed n_tok: pass iff any subschema arm is clean
    union <- SGen.option(SGen.listOfN(2, genIntSpec.map(_.copy(required = false))))
  } yield {
    val nSpec = union match {
      case Some(arms) => n.copy(types = arms.map(a => Right(a): Either[SchemaType, SchemaSpec]),
        minimum = None, maximum = None, divisibleBy = None)
      case None => n.copy(extendsSchemas = ext.toSeq, disallow = dis.map(Right(_)).toSeq)
    }
    SchemaSpec(
      types = Seq(Left(SchemaType.SObject)),
      properties = Map(
        "doc_id" -> d, "tokens" -> t, "source" -> s, "n_tok" -> nSpec))
  }

  // --- random rows (token arrays include null ELEMENTS — JSON nulls) ---

  private val genRow: SGen[(Option[String], Option[Seq[Option[Int]]], Option[Int], Option[String])] =
    for {
      d <- SGen.option(SGen.oneOf("d1", "d0000000001", "src0", "xx9", "BAD~1", ""))
      t <- SGen.option(SGen.listOfN(4, SGen.frequency(
        7 -> SGen.chooseNum(-3, 60).map(Option(_)),
        1 -> SGen.const(Option.empty[Int]))))
      tn <- SGen.chooseNum(0, 4)
      n <- SGen.option(SGen.chooseNum(-2, 130))
      s <- SGen.option(SGen.oneOf("src0", "src1", "zz", "d1"))
    } yield (d, t.map(_.take(tn)), n, s)

  private def rowToJson(r: (Option[String], Option[Seq[Option[Int]]], Option[Int], Option[String])): JValue =
    JObject(List(
      r._1.map(v => "doc_id" -> (JString(v): JValue)),
      r._2.map(v => "tokens" -> (JArray(
        v.map(_.map(i => JInt(BigInt(i)): JValue).getOrElse(JNull)).toList): JValue)),
      r._3.map(v => "n_tok" -> (JInt(BigInt(v)): JValue)),
      r._4.map(v => "source" -> (JString(v): JValue))).flatten)

  test("compiled pipeline ≡ oracle on 40 random specs × 60 random rows each") {
    val seed0 = Seed(20260816L)
    val specs = SGen.listOfN(40, genTableSpec)
      .apply(SGen.Parameters.default, seed0).get
    val rows = SGen.listOfN(60, genRow)
      .apply(SGen.Parameters.default, seed0.next).get

    val data = rows.map(r => Row(
      r._1.orNull,
      r._2.map(_.map(_.map(Integer.valueOf).orNull)).orNull,
      r._3.map(Integer.valueOf).orNull,
      r._4.orNull))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava),
      schema)

    specs.zipWithIndex.foreach { case (spec, si) =>
      val ann = ValidationEngine.annotate(df, spec).collect()
      ann.zip(rows).foreach { case (got, row) =>
        val expected = OracleValidator
          .validate(Map.empty, spec, rowToJson(row)).map(_.cid).toSet
        val gotSet = got.getAs[scala.collection.Seq[Row]](ValidationEngine.ViolationsCol)
          .map(_.getString(0)).toSet
        assert(gotSet == expected,
          s"spec#$si row=$row\n engine=$gotSet\n oracle=$expected\n spec=$spec")
      }
    }
  }

  test("JSONL ingestion ≡ oracle on derivable random specs (spec-derived schema path)") {
    val seed0 = Seed(20260817L)
    val specs = SGen.listOfN(40, genTableSpec)
      .apply(SGen.Parameters.default, seed0).get
    val rows = SGen.listOfN(40, genRow)
      .apply(SGen.Parameters.default, seed0.next).get
    val lines = rows.map(r =>
      org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(rowToJson(r))))
    import spark.implicits._
    val linesDf = spark.createDataset(lines).toDF("value")

    var tested = 0
    specs.zipWithIndex.foreach { case (spec, si) =>
      // schemaFor throws on underivable specs (array without items,
      // any-typed item without enum) — those are out of the JSONL
      // path's contract by design
      val parsedOpt =
        try Some(graft.sources.JsonlSource.parse(linesDf, spec))
        catch { case _: IllegalArgumentException => None }
      parsedOpt.foreach { parsed =>
        tested += 1
        val ann = ValidationEngine
          .annotate(parsed.drop(graft.sources.JsonlSource.CorruptCol), spec).collect()
        ann.zip(rows).foreach { case (got, row) =>
          val expected = OracleValidator
            .validate(Map.empty, spec, rowToJson(row)).map(_.cid).toSet
          val gotSet = got.getAs[scala.collection.Seq[Row]](ValidationEngine.ViolationsCol)
            .map(_.getString(0)).toSet
          assert(gotSet == expected,
            s"JSONL spec#$si row=$row\n engine=$gotSet\n oracle=$expected\n spec=$spec")
        }
      }
    }
    assert(tested >= 10, s"only $tested of 40 random specs were derivable — generator drift?")
  }

  // --- map-specialization differential (the MapType object path) ---

  private val keyPool = Seq("a", "b", "c", "d")

  private val genMapSpec: SGen[SchemaSpec] = for {
    props <- SGen.someOf(keyPool.take(3))
    propSpecs <- SGen.listOfN(props.size, genIntSpec)
    pat <- SGen.option(genIntSpec.map(s =>
      (SPattern("^[ab]"), s.copy(required = false))))
    add <- SGen.frequency[Either[Boolean, SchemaSpec]](
      2 -> SGen.const(Left(true)),
      1 -> SGen.const(Left(false)),
      1 -> genIntSpec.map(s => Right(s.copy(required = false))))
    dep <- SGen.option(SGen.oneOf[Either[Seq[String], SchemaSpec]](
      Left(Seq("b")),
      Right(SchemaSpec(properties = Map("c" ->
        SchemaSpec(types = Seq(Left(SchemaType.SInteger)), minimum = Some(BigDecimal(10))))))))
  } yield SchemaSpec(
    types = Seq(Left(SchemaType.SObject)),
    properties = props.zip(propSpecs).toMap,
    patternProperties = pat.toSeq,
    additionalProperties = add,
    dependencies = dep.map("a" -> _).toMap)

  private val genMapRow: SGen[Map[String, Long]] = for {
    keys <- SGen.someOf(keyPool)
    vals <- SGen.listOfN(keys.size, SGen.chooseNum(-5L, 120L))
  } yield keys.zip(vals).toMap

  test("map specialization ≡ oracle verdicts on 30 random specs × 40 random maps") {
    // cids differ by construction (the map path names pattern/additional
    // groups, the oracle names concrete keys), so verdicts are compared;
    // maps carry no null values (null-value semantics are the documented
    // collapse). Key presence in a map is TRUE presence, matching the
    // oracle's fields.contains exactly — unlike the struct path.
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val seed0 = Seed(20260817L)
    val specs = SGen.listOfN(30, genMapSpec).apply(SGen.Parameters.default, seed0).get
    val maps = SGen.listOfN(40, genMapRow).apply(SGen.Parameters.default, seed0.next).get

    val mt = MapType(StringType, LongType)
    val schema = StructType(Seq(StructField("m", mt, nullable = true)))
    val data = maps.map(m => Row(m))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava),
      schema)

    specs.zipWithIndex.foreach { case (spec, si) =>
      val cs = graft.compile.SpecCompiler.compileColumn(spec, mt, col("m"), "$")
      val verdicts: Seq[Boolean] =
        if (cs.isEmpty) Seq.fill(maps.size)(true)
        else df.select(cs.map(c => coalesce(c.pass, lit(false))).reduce(_ && _).as("p"))
          .collect().map(_.getBoolean(0)).toSeq
      verdicts.zip(maps).foreach { case (engine, m) =>
        val json = JObject(m.toList.sortBy(_._1).map { case (k, v) => k -> (JInt(BigInt(v)): JValue) })
        val oracle = OracleValidator.isValid(Map.empty, spec, json)
        assert(engine == oracle,
          s"map spec#$si m=$m\n engine=$engine oracle=$oracle\n spec=$spec")
      }
    }
  }

  test("emitted SQL ≡ engine on random specs (SqlGen renderer fuzz)") {
    // the same generator space as the differential above, through the
    // generateModule-analog SQL artifact: every rendered node family
    // (lambdas from items/uniqueItems, literal arrays from enums, union
    // OR-branches, extends/disallow composition) must round-trip
    val seed0 = Seed(20260818L)
    val specs = SGen.listOfN(20, genTableSpec)
      .apply(SGen.Parameters.default, seed0).get
    val rows = SGen.listOfN(40, genRow)
      .apply(SGen.Parameters.default, seed0.next).get
    val data = rows.map(r => Row(
      r._1.orNull,
      r._2.map(_.map(_.map(Integer.valueOf).orNull)).orNull,
      r._3.map(Integer.valueOf).orNull,
      r._4.orNull))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava),
      schema)
    df.createOrReplaceTempView("sqlgen_fuzz")
    def canon(rs: Array[Row]): Seq[String] = rs.map(_.toString).sorted.toSeq
    specs.zipWithIndex.foreach { case (spec, si) =>
      val sqlText = SqlGen.validationSql(spark, spec, schema, "sqlgen_fuzz", Seq("doc_id"))
      assert(!sqlText.contains("namedlambdavariable"), s"spec#$si:\n$sqlText")
      val got = canon(spark.sql(sqlText)
        .selectExpr("doc_id", "valid", "violations").collect())
      val want = canon(ValidationEngine.annotate(df, spec)
        .selectExpr("doc_id", "valid", "violations").collect())
      assert(got == want, s"spec#$si diverged\n spec=$spec\n sql=$sqlText")
    }
  }
}
