package graft.ops

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for [[MinhashSig]], callable from generated code. */
object MinhashSigUtil {
  /** The full k-wide MinHash signature of one text: distinct word
    * 3-gram shingles ([[Shingles3Util.compute]]), each hashed once
    * ([[SimhashUtil.hash60]] mod p = the SQL `bucketHash`), then every
    * affine transform's running min updated in the same pass. All
    * arithmetic is the same 64-bit long math as the Column form — the
    * values are identical, not approximately equal.
    */
  def compute(text: UTF8String, a: Array[Long], b: Array[Long], p: Long): ArrayData = {
    val sh = Shingles3Util.compute(text)
    val k = a.length
    val out = Array.fill(k)(Long.MaxValue)
    val n = sh.numElements()
    var i = 0
    while (i < n) {
      val h = SimhashUtil.hash60(sh.getUTF8String(i)) % p
      var j = 0
      while (j < k) {
        val v = (h * a(j) + b(j)) % p
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `MinhashSig(text)` → `array<long>` of the k MinHash values —
  * the corpus-wide signature pass as ONE codegen'd expression. The
  * Column form (`transform(shingles, md5-hash)` + k ×
  * `array_min(transform(...))`) is an eval-only HOF chain: it boxes
  * every shingle hash k+1 times and drops its stage out of whole-stage
  * codegen — and at 10^12 documents the signature pass IS the dedup
  * pipeline's full-corpus scan.
  */
case class MinhashSig(child: Expression, a: Array[Long], b: Array[Long],
    p: Long) extends UnaryExpression {
  require(a.length == b.length && a.nonEmpty, "k >= 1 coefficient pairs")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(t: Any): Any =
    MinhashSigUtil.compute(t.asInstanceOf[UTF8String], a, b, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", a, "long[]")
    val bRef = ctx.addReferenceObj("mhB", b, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.MinhashSigUtil.compute($c, $aRef, $bRef, ${p}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
