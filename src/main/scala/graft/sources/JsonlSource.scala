package graft.sources

import graft.spec.{SchemaSpec, SchemaType}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._

/** JSONL ingestion — the reference's native input shape (it validates
  * raw JSON values; its test fixtures are JSON documents on disk,
  * reference: test/TestSuite/Types.hs:48-64). The engine validates
  * typed columns, so the bridge is a PHYSICAL SCHEMA DERIVED FROM THE
  * SPEC ITSELF: `schemaFor` maps a draft-3 spec to the Catalyst
  * `StructType` its generated parser would target (the reference's
  * `CodeGen.hs` does the same spec → record-type mapping to Haskell),
  * and `parse`/`read` run `from_json` against it so a JSONL corpus is
  * validated with nothing but a spec.
  *
  * Scale shape: `spark.read.text` splits by line across executors,
  * `from_json` is one codegen'd projection — no shuffle, no driver
  * involvement beyond the (driver-side, once) schema derivation.
  *
  * Fidelity note, documented not hidden: a JSON value that exists but
  * cannot coerce to the derived field type (a string where an integer
  * is expected) parses to NULL *and* flags the whole record in
  * [[CorruptCol]] (Spark's PERMISSIVE mode marks partially-uncoercible
  * records corrupt) — at the ingestion boundary "wrong type" degrades
  * to the engine's null≡absent collapse plus the corrupt flag, so
  * callers can still route every imperfect line. Structurally
  * malformed lines land there too; nothing is ever dropped.
  */
object JsonlSource {

  /** Column holding the raw line when it is not parseable JSON. */
  val CorruptCol = "_corrupt_record"

  /** The Catalyst type a spec node implies. Throws (documented
    * unsupported-spec error, never silent truncation) when the spec
    * does not pin down a physical type: heterogeneous unions,
    * `any`-typed nodes without an enum to infer from, arrays without
    * `items`, objects with neither `properties` nor a typed
    * `additionalProperties` schema.
    */
  def dataTypeFor(spec: SchemaSpec, path: String = "$"): DataType = {
    import SchemaType._
    def ofType(t: SchemaType): DataType = t match {
      case SString  => StringType
      case SInteger => LongType
      case SNumber  => DoubleType
      case SBoolean => BooleanType
      case SObject  => objectType(spec, path)
      case SArray   => arrayType(spec, path)
      case SNull    => NullType
      case SAny     => anyType(spec, path)
    }
    val arms = spec.types.map {
      case Left(t)    => ofType(t)
      case Right(sub) => dataTypeFor(sub, path)
    }
    // null arms only widen nullability (everything is nullable here)
    val concrete = arms.filterNot(_ == NullType).distinct
    concrete match {
      case Seq()  => StringType // only-null: representable, trivially
      case Seq(t) => t
      case ts if ts.forall(t => t == LongType || t == DoubleType) => DoubleType
      case ts => throw new IllegalArgumentException(
        s"$path: union ${ts.map(_.simpleString).mkString("|")} has no single physical type")
    }
  }

  private def objectType(spec: SchemaSpec, path: String): DataType =
    if (spec.properties.nonEmpty)
      StructType(spec.properties.toSeq.sortBy(_._1).map { case (n, p) =>
        StructField(n, dataTypeFor(p, s"$path.$n"), nullable = true)
      })
    else spec.additionalProperties match {
      case Right(vs) => MapType(StringType, dataTypeFor(vs, s"$path.*"))
      case Left(_) => spec.patternProperties.map(_._2) match {
        case Seq(one) => MapType(StringType, dataTypeFor(one, s"$path.*"))
        case _ => throw new IllegalArgumentException(
          s"$path: object without properties or a single value schema has no physical type")
      }
    }

  private def arrayType(spec: SchemaSpec, path: String): DataType = spec.items match {
    case Some(Left(elem)) => ArrayType(dataTypeFor(elem, s"$path[*]"), containsNull = true)
    case Some(Right(tuple)) =>
      val ts = tuple.map(dataTypeFor(_, s"$path[i]")).distinct
      val extra = spec.additionalItems match {
        case Right(s) => Seq(dataTypeFor(s, s"$path[+]"))
        case Left(_)  => Nil
      }
      (ts ++ extra).distinct match {
        case Seq(one) => ArrayType(one, containsNull = true)
        case many => throw new IllegalArgumentException(
          s"$path: tuple items ${many.map(_.simpleString).mkString("|")} have no single element type")
      }
    case None => throw new IllegalArgumentException(
      s"$path: array without items has no physical element type")
  }

  /** `any`-typed node: infer from enum literals when present. */
  private def anyType(spec: SchemaSpec, path: String): DataType =
    spec.enumValues match {
      case Some(vs) if vs.nonEmpty =>
        val ts = vs.collect {
          case _: JString                       => StringType: DataType
          case _: JBool                         => BooleanType: DataType
          case _: JInt | _: JLong               => LongType: DataType
          case _: JDouble | _: JDecimal         => DoubleType: DataType
        }.distinct
        ts match {
          case Seq(one) => one
          case many if many.forall(t => t == LongType || t == DoubleType) => DoubleType
          case _ => throw new IllegalArgumentException(
            s"$path: 'any' node's enum spans multiple physical types")
        }
      case _ => throw new IllegalArgumentException(
        s"$path: 'any'-typed node has no physical type (add a type or an enum)")
    }

  /** The row schema a top-level object spec implies (derived fields in
    * name order) plus [[CorruptCol]] for malformed-line capture.
    */
  def schemaFor(spec: SchemaSpec): StructType = {
    val st = dataTypeFor(spec) match {
      case s: StructType => s
      case other => throw new IllegalArgumentException(
        s"top-level spec must derive a struct row, got ${other.simpleString}")
    }
    StructType(st.fields :+ StructField(CorruptCol, StringType, nullable = true))
  }

  /** Parse a one-string-column DataFrame of JSONL lines against the
    * spec-derived schema. Output: one column per derived field plus
    * [[CorruptCol]] (the raw line iff it was not parseable JSON).
    */
  def parse(lines: DataFrame, spec: SchemaSpec, lineCol: String = "value"): DataFrame = {
    val schema = schemaFor(spec)
    lines
      .select(from_json(col(lineCol), schema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)).as("_r"))
      .select(col("_r.*"))
  }

  /** Read a JSONL file/directory and parse it against the spec. */
  def read(spark: SparkSession, path: String, spec: SchemaSpec): DataFrame =
    parse(spark.read.text(path), spec, "value")
}
