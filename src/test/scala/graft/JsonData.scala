package graft

import graft.compile.SpecCompiler
import graft.spec.{SchemaParser, SchemaSpec}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._

/** Test-side bridge from dynamic JSON values to typed Spark rows, so
  * conformance fixtures (arbitrary JSON) can be run through the
  * Catalyst-compiled engine — the dual-engine discipline of the
  * reference (reference: test/Data/Aeson/Schema/CodeGen/Tests.hs:301-302,
  * which asserts its interpreter and its generated parsers agree).
  *
  * The engine validates TYPED columns, so each JSON value gets a Spark
  * type inferred from its own structure (objects → StructType with
  * sorted fields, arrays → unified element type). Values outside the
  * engine's data model return None and are oracle-only:
  *   - heterogeneous arrays (e.g. `[1, "x"]`)
  *   - top-level null (no column type to infer)
  * JSON nulls inside objects map to SQL NULL — the documented
  * null/absent collapse (SURVEY.md §7.4) — so fixture cases whose
  * verdict depends on "null property present ≠ absent" are oracle-only
  * by construction and must be marked as such.
  */
object JsonData {

  /** Placeholder field for empty JSON objects (Spark's empty structs are
    * not constructible through createDataFrame); always NULL, so every
    * guard treats it as absent. Fixtures must not use patterns matching
    * this name.
    */
  val EmptyField = "__absent__"

  def sparkTypeOf(v: JValue): Option[DataType] = v match {
    case JString(_)  => Some(StringType)
    case JBool(_)    => Some(BooleanType)
    case JInt(_) | JLong(_) => Some(LongType)
    case JDouble(_) | JDecimal(_) => Some(DoubleType)
    case JNull       => None
    case JNothing    => None
    case JArray(xs)  =>
      val elemTypes = xs.filterNot(_ == JNull).map(sparkTypeOf)
      if (elemTypes.exists(_.isEmpty)) None
      else unify(elemTypes.flatten).map(et => ArrayType(et, containsNull = true))
    case JObject(fields) =>
      if (fields.isEmpty)
        Some(StructType(Seq(StructField(EmptyField, StringType, nullable = true))))
      else {
        val fs = fields.sortBy(_._1).map { case (k, fv) =>
          val ft = fv match {
            case JNull => Some(StringType) // null value: type is unconstrained
            case other => sparkTypeOf(other)
          }
          ft.map(t => StructField(k, t, nullable = true))
        }
        if (fs.exists(_.isEmpty)) None else Some(StructType(fs.map(_.get)))
      }
    case _ => None
  }

  private def unify(ts: Seq[DataType]): Option[DataType] = ts.distinct match {
    case Seq()  => Some(LongType) // empty array: element type is moot
    case Seq(t) => Some(t)
    case many if many.forall(t => t == LongType || t == DoubleType) => Some(DoubleType)
    case _ => None
  }

  def toRowValue(v: JValue, dt: DataType): Any = (v, dt) match {
    case (JNull, _)                    => null
    case (JString(s), StringType)      => s
    case (JBool(b), BooleanType)       => b
    case (JInt(i), LongType)           => i.toLong
    case (JLong(l), LongType)          => l
    case (JInt(i), DoubleType)         => i.toDouble
    case (JLong(l), DoubleType)        => l.toDouble
    case (JDouble(d), DoubleType)      => d
    case (JDecimal(d), DoubleType)     => d.toDouble
    case (JArray(xs), ArrayType(et, _)) => xs.map(toRowValue(_, et))
    case (JObject(fields), st: StructType) =>
      val m = fields.toMap
      Row.fromSeq(st.fields.toSeq.map { f =>
        if (f.name == EmptyField) null
        else m.get(f.name).map(toRowValue(_, f.dataType)).orNull
      })
    case (other, t) =>
      throw new IllegalArgumentException(s"cannot render $other as ${t.simpleString}")
  }

  /** A MapType rendering of a JSON object (the engine's map
    * specialization, O7) when all non-null values share one type.
    */
  def mapTypeOf(v: JValue): Option[MapType] = v match {
    case JObject(fields) =>
      unify(fields.map(_._2).filterNot(_ == JNull).flatMap(sparkTypeOf(_).toSeq))
        .collect { case t if fields.nonEmpty => MapType(StringType, t, valueContainsNull = true) }
    case _ => None
  }

  def toMapValue(v: JValue, mt: MapType): Map[String, Any] = v match {
    case JObject(fields) =>
      fields.map { case (k, fv) => k -> toRowValue(fv, mt.valueType) }.toMap
    case other => throw new IllegalArgumentException(s"not an object: $other")
  }

  /** Catalyst-engine verdict for one JSON value against a spec:
    * Some(valid) when the value is representable, None when oracle-only.
    */
  def engineValid(spark: SparkSession, graph: Map[String, SchemaSpec],
      spec0: SchemaSpec, data: JValue): Option[Boolean] = {
    val spec = if (graph.isEmpty && spec0.ref.isEmpty) spec0
               else SchemaParser.inline(graph + ("__root__" -> spec0), spec0)
    sparkTypeOf(data).map { dt =>
      evalConstraints(spark, spec, dt, Row(toRowValue(data, dt)))
    }
  }

  /** Same, through the MapType specialization (object values only). */
  def engineValidMap(spark: SparkSession, graph: Map[String, SchemaSpec],
      spec0: SchemaSpec, data: JValue): Option[Boolean] = {
    val spec = if (graph.isEmpty && spec0.ref.isEmpty) spec0
               else SchemaParser.inline(graph + ("__root__" -> spec0), spec0)
    mapTypeOf(data).map { mt =>
      evalConstraints(spark, spec, mt, Row(toMapValue(data, mt)))
    }
  }

  private def evalConstraints(spark: SparkSession, spec: SchemaSpec,
      dt: DataType, row: Row): Boolean = {
    val cs = SpecCompiler.compileColumn(spec, dt, col("v"), "$")
    if (cs.isEmpty) true
    else {
      val schema = StructType(Seq(StructField("v", dt, nullable = true)))
      val df = spark.createDataFrame(
        java.util.Collections.singletonList(row), schema)
      val pass = cs.map(c => coalesce(c.pass, lit(false))).reduce(_ && _)
      df.select(pass.as("p")).collect()(0).getBoolean(0)
    }
  }
}
