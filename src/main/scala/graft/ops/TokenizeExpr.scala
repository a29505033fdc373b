package graft.ops

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for [[TokenizeWords]], callable from generated code. */
final class TokenizeKernel(vocab: Int) extends Serializable {
  private val Space = UTF8String.fromString(" ")

  /** One token id per word: `hash60(w) mod vocab` — [[SimhashUtil.hash60]]
    * is non-negative, so `%` ≡ the SQL `pmod`. One split and one md5 per
    * word, straight into a primitive int array.
    */
  def compute(text: UTF8String): ArrayData = {
    val words = text.split(Space, -1)
    val out = new Array[Int](words.length)
    var i = 0
    while (i < words.length) {
      out(i) = (SimhashUtil.hash60(words(i)) % vocab).toInt
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `TokenizeWords(text, vocab)` ≡ the declarative
  * `transform(words(text), w => pmod(portableHash(w), vocab).cast("int"))`
  * — as ONE codegen'd pass. The HOF form is eval-only (drops its stage
  * out of whole-stage codegen, boxes every element, and routes each word
  * through the interpreted conv/substring/md5 expression chain); it is
  * retained as [[SeqOps.tokenizeRef]], the differential oracle asserted
  * equal by OpsSpec. Null text → null array, same as `transform(null)`.
  */
case class TokenizeWords(child: Expression, vocab: Int) extends UnaryExpression {
  require(vocab > 0, s"vocab must be positive, got $vocab")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "tokenize_words"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tokenize_words expects string, got ${other.simpleString}")
  }

  @transient private lazy val kernel = new TokenizeKernel(vocab)

  override def nullSafeEval(t: Any): Any =
    kernel.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("tokenizeKernel", kernel, classOf[TokenizeKernel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $k.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
