package graft.ops

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for [[TextClassifierLogit]], callable from generated code —
  * a fastText-style linear classifier over hashed word + bigram
  * features: each word contributes `w[hash(word) mod K]`, each adjacent
  * bigram `w[(h1*31 + h2) mod p mod K]`, the feature sum is averaged
  * over the 2n−1 features and shifted by the bias. The weight table is
  * a PLAN CONSTANT (broadcast to executors as a codegen reference
  * object) — at 10^12 rows the model rides the closure, not a join.
  * One split + one md5 per word, same hash as the whole text family
  * ([[SimhashUtil.hash60]] mod [[TextOps.HashPrime]]), so the DuckDB
  * oracle reproduces scores bit-for-bit (the shipped demo weights are
  * exact binary fractions, making the feature sums EXACT doubles —
  * summation order cannot diverge engines).
  */
final class TextClassifierKernel(weights: Array[Double], bias: Double,
    prime: Long) extends Serializable {
  private val Space = UTF8String.fromString(" ")
  private val k = weights.length

  def logit(text: UTF8String): Double = {
    val ws = text.split(Space, -1)
    var sum = 0.0
    var prev = 0L
    var i = 0
    while (i < ws.length) {
      val h = SimhashUtil.hash60(ws(i)) % prime
      sum += weights((h % k).toInt)
      // h < p (~2^30): h*31 + h' < 2^35 — overflow-free long arithmetic
      if (i > 0) sum += weights((((prev * 31L + h) % prime) % k).toInt)
      prev = h
      i += 1
    }
    val n = math.max(2 * ws.length - 1, 1)
    bias + sum / n
  }
}

/** `TextClassifierLogit(text)` — the learned-quality-gate scorer as a
  * codegen'd kernel (the [[WordStats]] discipline: HOF folds are
  * eval-only and would drop the corpus scan out of whole-stage codegen).
  * Returns the LINEAR logit; [[TextOps.classifierScore]] applies the
  * sigmoid (monotone, so gate thresholds are equivalent either side —
  * and the logit is the cross-engine-comparable form: `exp()` may
  * differ in the last ulp between engines, exact sums do not).
  * Null text → null. Declarative reference:
  * [[TextOps.classifierLogitRef]], asserted equal by OpsSpec.
  */
case class TextClassifierLogit(child: Expression, weights: Seq[Double],
    bias: Double, prime: Long) extends UnaryExpression {

  require(weights.nonEmpty, "classifier needs a non-empty weight table")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "txt_classifier_logit"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"txt_classifier_logit expects a string, got ${other.simpleString}")
  }

  @transient private lazy val kernel =
    new TextClassifierKernel(weights.toArray, bias, prime)

  override def nullSafeEval(t: Any): Any =
    kernel.logit(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("txtClassifierKernel", kernel,
      classOf[TextClassifierKernel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $k.logit($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
