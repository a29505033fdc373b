package graft.ops

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for [[TokenGrams]], callable from generated code. */
final class TokenGramsKernel(n: Int) extends Serializable {

  /** Distinct token `n`-grams of an `array<int>` in first-occurrence
    * order, each rendered as the comma-joined decimal string (null
    * elements render as the `ø` sentinel — the [[TokenStatsKernel]] /
    * `SeqOps.tokenStatsRef` gram format, so the three gram views of a
    * sequence agree). Sequences shorter than `n` tokens yield the whole
    * sequence as ONE gram (the [[Shingles3Util]] rule: a short eval item
    * can still be matched exactly).
    */
  def compute(toks: ArrayData): ArrayData = {
    val len = toks.numElements()
    val seen = new java.util.LinkedHashSet[UTF8String]
    if (len < n) seen.add(gramAt(toks, 0, len))
    else {
      var p = 0
      while (p + n <= len) { seen.add(gramAt(toks, p, n)); p += 1 }
    }
    new GenericArrayData(
      seen.toArray(new Array[AnyRef](seen.size())).asInstanceOf[Array[Any]])
  }

  private def gramAt(toks: ArrayData, start: Int, count: Int): UTF8String = {
    val sb = new java.lang.StringBuilder()
    var j = 0
    while (j < count) {
      if (j > 0) sb.append(',')
      if (toks.isNullAt(start + j)) sb.append('ø')
      else sb.append(toks.getInt(start + j))
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `TokenGrams(tokens, n)` — distinct token `n`-grams of a pre-tokenized
  * sequence as ONE codegen'd expression, for the token-space
  * decontamination / overlap operators (the `array<int>` sibling of
  * [[Shingles3]]). The declarative `transform(sequence(...))` chain is
  * eval-only (drops the whole stage out of whole-stage codegen and boxes
  * every element); it is retained as `SeqOps.tokenGramsRef`, asserted ≡
  * by OpsSpec.
  *
  * Null semantics: null array → null (a missing sequence has no grams;
  * validation owns nulls); null ELEMENTS gram as the `ø` sentinel.
  */
case class TokenGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"token grams need n >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_grams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_grams expects array<int>, got ${other.simpleString}")
  }

  @transient private lazy val kernel = new TokenGramsKernel(n)

  override def nullSafeEval(t: Any): Any =
    kernel.compute(t.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("tokenGramsKernel", kernel, classOf[TokenGramsKernel].getName)
    defineCodeGen(ctx, ev, c => s"$k.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
