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

  private val genArraySpec: SGen[SchemaSpec] = for {
    req <- SGen.oneOf(true, false)
    minI <- SGen.chooseNum(0, 3)
    maxI <- SGen.option(SGen.chooseNum(2, 12))
    uniq <- SGen.oneOf(true, false)
    item <- SGen.option(genIntSpec.map(_.copy(required = false)))
  } yield SchemaSpec(types = Seq(Left(SchemaType.SArray)), required = req,
    minItems = minI, maxItems = maxI, uniqueItems = uniq,
    items = item.map(Left(_)))

  private val genTableSpec: SGen[SchemaSpec] = for {
    d <- genStringSpec
    t <- genArraySpec
    n <- genIntSpec
    s <- genStringSpec
    // exercise composition keywords on n_tok occasionally
    ext <- SGen.option(genIntSpec.map(_.copy(required = false)))
    dis <- SGen.option(SGen.const(SchemaSpec(types = Seq(Left(SchemaType.SInteger)),
      minimum = Some(BigDecimal(1000)))))
  } yield SchemaSpec(
    types = Seq(Left(SchemaType.SObject)),
    properties = Map(
      "doc_id" -> d, "tokens" -> t, "source" -> s,
      "n_tok" -> n.copy(extendsSchemas = ext.toSeq, disallow = dis.map(Right(_)).toSeq)))

  // --- random rows ---

  private val genRow: SGen[(Option[String], Option[Seq[Int]], Option[Int], Option[String])] =
    for {
      d <- SGen.option(SGen.oneOf("d1", "d0000000001", "src0", "xx9", "BAD~1", ""))
      t <- SGen.option(SGen.listOfN(4, SGen.chooseNum(-3, 60)).map(_.take(4)))
      tn <- SGen.chooseNum(0, 4)
      n <- SGen.option(SGen.chooseNum(-2, 130))
      s <- SGen.option(SGen.oneOf("src0", "src1", "zz", "d1"))
    } yield (d, t.map(_.take(tn)), n, s)

  private def rowToJson(r: (Option[String], Option[Seq[Int]], Option[Int], Option[String])): JValue =
    JObject(List(
      r._1.map(v => "doc_id" -> (JString(v): JValue)),
      r._2.map(v => "tokens" -> (JArray(v.map(i => JInt(BigInt(i))).toList): JValue)),
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
      r._2.orNull,
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
}
