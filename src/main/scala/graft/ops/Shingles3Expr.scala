package graft.ops

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for [[Shingles3]], callable from generated code via the static
  * forwarder (`graft.ops.Shingles3Util.compute`).
  */
object Shingles3Util {
  private val Space = UTF8String.fromString(" ")

  /** Distinct word 3-grams in first-occurrence order; texts shorter than
    * 3 words yield the whole text as one shingle. Split semantics match
    * SQL `split(text, " ")` (UTF8String.split, limit -1).
    */
  def compute(text: UTF8String): ArrayData = {
    val words = text.split(Space, -1)
    if (words.length < 3) return new GenericArrayData(Array[Any](text))
    val seen = new java.util.LinkedHashSet[UTF8String]
    var i = 0
    while (i + 2 < words.length) {
      seen.add(UTF8String.concatWs(Space, words(i), words(i + 1), words(i + 2)))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())).asInstanceOf[Array[Any]])
  }
}

/** `Shingles3(text)` ≡ `when(size(words) >= 3,
  * array_distinct(transform(sequence(...), 3-gram concat)))
  * .otherwise(array(text))` — the word-3-gram shingle set, as ONE
  * codegen'd expression.
  *
  * The declarative form is a higher-order-function chain, and ANY
  * eval-only expression in a stage drops the WHOLE stage out of
  * whole-stage codegen — measured on the inverted-index build
  * (shingle → explode): the interpreted Generate stage cost ~13 µs per
  * output row, ~8× the stage's entire codegen'd cost. With this
  * expression the scan → shingle → explode stage compiles like any
  * built-in pipeline.
  */
case class Shingles3(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles3"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles3 expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(t: Any): Any =
    Shingles3Util.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.Shingles3Util.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
