package graft.ops

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for [[RollingHashes]], callable from generated code. */
final class RollingHashesKernel(k: Int) extends Serializable {

  /** 64-bit hashes of every ROLLING `k`-word gram of a single-space
    * text, stride 1, in position order — `max(words − k + 1, 1)`
    * elements (a doc shorter than `k` words yields one whole-text
    * hash, the [[Dedup.rollingGramStats]] convention). One pass over
    * the UTF-8 bytes: FNV-1a per word (empty words between doubled
    * spaces hash like `split(text, " ")`'s empty strings), then an
    * order-sensitive polynomial fold over each window of `k` word
    * hashes. The output is a GROUPING key, not portable content —
    * two distinct grams collide with probability ~2⁻⁶⁴ (the
    * [[Dedup.ngramJaccardPairs]] 8-byte-key argument), which
    * miscounts one gram pair; content-removal decisions must rekey
    * on content.
    */
  def compute(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    // pass 1 over bytes: hash words in place
    var nWords = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nWords += 1; i += 1 }
    val wh = new Array[Long](nWords)
    var w = 0
    var h = Fnv64Offset
    i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == ' ') { wh(w) = mix(h); w += 1; h = Fnv64Offset }
      else h = (h ^ (b & 0xffL)) * Fnv64Prime
      i += 1
    }
    wh(w) = mix(h)
    // pass 2: polynomial fold per stride-1 window
    val nGrams = math.max(nWords - k + 1, 1)
    val width = math.min(k, nWords)
    val out = new Array[Any](nGrams)
    var g = 0
    while (g < nGrams) {
      var acc = 0L
      var j = 0
      while (j < width) { acc = acc * GramMult + wh(g + j); j += 1 }
      out(g) = acc
      g += 1
    }
    new GenericArrayData(out)
  }

  /** [[compute]] plus the doc's word count, as `struct(n_words, hs)` —
    * for consumers that need the count downstream of the explode (the
    * span end clamp for docs shorter than `k`) without a second
    * tokenization pass.
    */
  def computeWithCount(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val hs = compute(text)
    val nGrams = hs.numElements()
    // grams = max(words − k + 1, 1): words recoverable except when the
    // single-gram case is a SHORT doc — recount cheaply from the bytes
    val nWords =
      if (nGrams > 1) nGrams + k - 1
      else {
        val bytes = text.getBytes
        var n = 1; var i = 0
        while (i < bytes.length) { if (bytes(i) == ' ') n += 1; i += 1 }
        n
      }
    org.apache.spark.sql.catalyst.InternalRow(nWords, hs)
  }

  private final val Fnv64Offset = 0xcbf29ce484222325L
  private final val Fnv64Prime = 0x100000001b3L
  private final val GramMult = 0x9e3779b185ebca87L // odd → invertible mod 2^64
  // finalize the per-word FNV so the gram polynomial sees well-mixed
  // inputs (splitmix64 finalizer)
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
}

/** `RollingHashes(text, k)` — the rolling-gram GROUPING keys of a doc as
  * ONE codegen'd expression. The declarative form materializes every
  * gram as a string (`array_join(slice(words, …))` — ~k× the text's
  * bytes allocated per doc) before hashing; this kernel hashes each
  * word once and folds windows, allocating only the long array. The
  * string form is retained in [[Dedup.rollingGramStatsRef]] and
  * asserted count-equivalent by OpsSpec.
  *
  * Null semantics: null text → null (validation owns nulls).
  */
/** `RollingHashesWithCount(text, k)` — `struct(n_words, hs)`: the same
  * rolling-gram keys plus the doc's word count, for consumers (the
  * span merger) that need the short-doc end clamp after the explode
  * without re-tokenizing.
  */
case class RollingHashesWithCount(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"rolling grams need k >= 1, got $k")

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_words",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("hs",
      ArrayType(LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "rolling_hashes_n"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_hashes_n expects string, got ${other.simpleString}")
  }

  @transient private lazy val kernel = new RollingHashesKernel(k)

  override def nullSafeEval(t: Any): Any =
    kernel.computeWithCount(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kn = ctx.addReferenceObj("rollingHashesKernel", kernel,
      classOf[RollingHashesKernel].getName)
    defineCodeGen(ctx, ev, c => s"$kn.computeWithCount($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class RollingHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"rolling grams need k >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_hashes expects string, got ${other.simpleString}")
  }

  @transient private lazy val kernel = new RollingHashesKernel(k)

  override def nullSafeEval(t: Any): Any =
    kernel.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kn = ctx.addReferenceObj("rollingHashesKernel", kernel,
      classOf[RollingHashesKernel].getName)
    defineCodeGen(ctx, ev, c => s"$kn.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
