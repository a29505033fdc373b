package graft.ops

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Kernel for [[TokenStats]], callable from generated code. */
final class TokenStatsKernel(n: Int, vocab: Int) extends Serializable {

  // n-gram windows pack into one Long when n == 3 and every value fits
  // 21 unsigned bits (any practical token id; Vocab here is 49152) — the
  // common case costs one boxed Long per window, no string building. The
  // unpackable remainder (out-of-range ids, null elements, n != 3) keys
  // by the joined decimal string; the two sets cover DISJOINT windows,
  // so distinct = |packed| + |strings| exactly.
  private val Packable21 = 1 << 21

  /** One pass over a token array: `[nTok, gramPositions, distinctGrams,
    * nOov]`. Sequences shorter than `n` tokens count as ONE whole-
    * sequence gram (the [[Shingles3Util]] rule, so dup_ratio is 0, not
    * null, for short docs). Null elements count as out-of-vocabulary and
    * participate in grams as a sentinel.
    */
  def compute(toks: ArrayData): ArrayData = {
    val len = toks.numElements()
    var oov = 0L
    var i = 0
    while (i < len) {
      if (toks.isNullAt(i)) oov += 1
      else { val v = toks.getInt(i); if (v < 0 || v >= vocab) oov += 1 }
      i += 1
    }
    val (positions, distinct) =
      if (len < n) (1L, 1L)
      else {
        val packed = new java.util.HashSet[java.lang.Long]()
        var strs: java.util.HashSet[String] = null
        var p = 0
        while (p + n <= len) {
          var packable = n == 3
          var j = 0
          while (packable && j < n) {
            packable = !toks.isNullAt(p + j) && {
              val v = toks.getInt(p + j); v >= 0 && v < Packable21
            }
            j += 1
          }
          if (packable) {
            packed.add(
              (toks.getInt(p).toLong << 42) |
              (toks.getInt(p + 1).toLong << 21) |
              toks.getInt(p + 2).toLong)
          } else {
            if (strs == null) strs = new java.util.HashSet[String]()
            val sb = new java.lang.StringBuilder()
            var j2 = 0
            while (j2 < n) {
              if (j2 > 0) sb.append(',')
              if (toks.isNullAt(p + j2)) sb.append('ø')
              else sb.append(toks.getInt(p + j2))
              j2 += 1
            }
            strs.add(sb.toString)
          }
          p += 1
        }
        ((len - n + 1).toLong,
          packed.size.toLong + (if (strs == null) 0L else strs.size.toLong))
      }
    UnsafeArrayData.fromPrimitiveArray(Array(len.toLong, positions, distinct, oov))
  }
}

/** `TokenStats(tokens)` — the fused scan kernel for the engine's PRIMARY
  * input shape (`tokens array<int>`, BASELINE.json `input_hint`): token
  * count, token-`n`-gram positions, DISTINCT `n`-grams, and
  * out-of-vocabulary count in ONE codegen'd pass, as `array<long>`
  * `[nTok, gramPositions, distinctGrams, nOov]`.
  *
  * The token-space sibling of [[WordStats]]: the declarative forms
  * (`transform(sequence(...))`/`array_distinct`/`filter` HOF chains) are
  * eval-only — one in a projection drops the whole stage out of
  * whole-stage codegen and boxes every element — and are retained in
  * [[SeqOps]] as `*Ref` differential oracles, asserted equal by OpsSpec.
  *
  * Null semantics: null array → null; null ELEMENTS count as
  * out-of-vocabulary and gram as a sentinel.
  */
case class TokenStats(child: Expression, n: Int, vocab: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_stats expects array<int>, got ${other.simpleString}")
  }

  @transient private lazy val kernel = new TokenStatsKernel(n, vocab)

  override def nullSafeEval(t: Any): Any =
    kernel.compute(t.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("tokenStatsKernel", kernel, classOf[TokenStatsKernel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $k.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
