package graft.ops

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `DotProd(x, y)` ≡ `aggregate(zip_with(x, y, (p, q) =>
  * p.cast("double") * q.cast("double")), 0.0, (acc, v) => acc + v)` —
  * the dot product of two numeric array columns in double, with
  * identical left-to-right summation order and identical null semantics
  * (null array, length mismatch, or any null element → null).
  *
  * The declarative form is built from higher-order functions, which are
  * eval-only in Spark: the stage falls out of whole-stage codegen and
  * every element is boxed twice (zip_with's struct array, aggregate's
  * lambda variables). This expression is fully codegen'd (`doGenCode`):
  * one fused primitive loop per pair, no intermediate array. It is the
  * hot inner operation of every cosine path in [[Similarity]] and
  * [[Dedup]] (|Q|×|corpus| pairs in brute-force ANN, one per candidate
  * pair in near-dup joins).
  *
  * Element null checks are elided at plan time when both element types
  * are non-nullable (`containsNull = false`) — the embeddings case.
  */
case class DotProd(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_prod"

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(et: NumericType, _) => Some(et)
    case _                             => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_prod expects two numeric arrays, got (${left.dataType.simpleString}, " +
          s"${right.dataType.simpleString})")
    }

  private lazy val (lt, lNulls) = left.dataType match {
    case ArrayType(et, n) => (et, n)
  }
  private lazy val (rt, rNulls) = right.dataType match {
    case ArrayType(et, n) => (et, n)
  }

  private def get(a: ArrayData, i: Int, et: DataType): Double = et match {
    case DoubleType  => a.getDouble(i)
    case FloatType   => a.getFloat(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case LongType    => a.getLong(i).toDouble
    case ShortType   => a.getShort(i).toDouble
    case ByteType    => a.getByte(i).toDouble
    case _: DecimalType => a.get(i, et).asInstanceOf[Decimal].toDouble
  }

  override def nullSafeEval(x: Any, y: Any): Any = {
    val a = x.asInstanceOf[ArrayData]
    val b = y.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if ((lNulls && a.isNullAt(i)) || (rNulls && b.isNullAt(i))) return null
      s += get(a, i, lt) * get(b, i, rt)
      i += 1
    }
    s
  }

  /** Primitive accessor java snippet for one element. */
  private def getJava(arr: String, i: String, et: DataType): String = et match {
    case DoubleType  => s"$arr.getDouble($i)"
    case FloatType   => s"(double) $arr.getFloat($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType    => s"(double) $arr.getLong($i)"
    case ShortType   => s"(double) $arr.getShort($i)"
    case ByteType    => s"(double) $arr.getByte($i)"
    case d: DecimalType =>
      s"$arr.getDecimal($i, ${d.precision}, ${d.scale}).toDouble()"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (av, bv) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val nullCheck =
        if (lNulls || rNulls)
          s"""if (${if (lNulls) s"$av.isNullAt($i)" else "false"} ||
             |    ${if (rNulls) s"$bv.isNullAt($i)" else "false"}) {
             |  ${ev.isNull} = true; break;
             |}""".stripMargin
        else ""
      s"""
         |final int $n = $av.numElements();
         |if ($n != $bv.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $s += ${getJava(av, i, lt)} * ${getJava(bv, i, rt)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
