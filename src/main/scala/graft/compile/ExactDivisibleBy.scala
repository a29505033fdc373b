package graft.compile

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Arbitrary-precision `divisibleBy` — exact at ANY scale, like the
  * reference's Scientific arithmetic (reference: Helpers.hs:59-67,
  * `divMod` over coefficient×10^exponent with no precision ceiling).
  * The compiler's default arm stays DecimalType(38,18) remainder (exact
  * within 38 digits, codegen'd decimal arithmetic); this expression is
  * the escape hatch [[SpecCompiler]] selects when the divisor itself
  * does not fit that representation (precision > 38 or scale > 18) —
  * previously the documented SURVEY §7.5 limit.
  *
  * Semantics per input type (matching the decimal arm's conversions):
  * integral → exact BigDecimal; double/float → `BigDecimal.valueOf`
  * (the value's shortest decimal rendering — the same decimal the JSON
  * literal carried for round-trippable doubles); decimal → exact.
  * Codegen'd: the divisor rides along as a reference object, the check
  * is one `remainder().signum()` per row inside whole-stage codegen.
  */
case class ExactDivisibleBy(child: Expression, divisor: java.math.BigDecimal)
    extends UnaryExpression {

  require(divisor.signum != 0, "divisibleBy divisor must be non-zero")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_divisible_by"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_divisible_by expects a numeric value, got ${other.simpleString}")
  }

  /** Emitted-SQL form ([[graft.engine.SqlGen]] renders through this):
    * the divisor travels as a string literal so no precision is lost in
    * the artifact text; [[graft.GraftFunctions]] registers the matching
    * SQL function.
    */
  override def sql: String =
    s"$prettyName(${child.sql}, '${divisor.toPlainString}')"

  private def toBig(v: Any): java.math.BigDecimal = v match {
    case d: Decimal => d.toJavaBigDecimal
    case d: Double  => java.math.BigDecimal.valueOf(d)
    case f: Float   => java.math.BigDecimal.valueOf(f.toDouble)
    case l: Long    => java.math.BigDecimal.valueOf(l)
    case i: Int     => java.math.BigDecimal.valueOf(i.toLong)
    case s: Short   => java.math.BigDecimal.valueOf(s.toLong)
    case b: Byte    => java.math.BigDecimal.valueOf(b.toLong)
  }

  override def nullSafeEval(v: Any): Any =
    toBig(v).remainder(divisor).signum == 0

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val d = ctx.addReferenceObj("graftDivisor", divisor,
      classOf[java.math.BigDecimal].getName)
    val conv: String => String = child.dataType match {
      case _: DecimalType => c => s"$c.toJavaBigDecimal()"
      case DoubleType     => c => s"java.math.BigDecimal.valueOf($c)"
      case FloatType      => c => s"java.math.BigDecimal.valueOf((double) $c)"
      case _              => c => s"java.math.BigDecimal.valueOf((long) $c)"
    }
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${conv(c)}.remainder($d).signum() == 0;")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
