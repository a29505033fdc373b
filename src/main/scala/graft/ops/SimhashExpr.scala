package graft.ops

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for [[SimhashOfText]], callable from generated code. */
object SimhashUtil {
  private val Space = UTF8String.fromString(" ")
  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** The 60-bit portable hash of one word: numerically equal to
    * `conv(substring(md5(cast(w as binary)), 1, 15), 16, 10)` — the
    * first 15 hex chars of the md5 = the first 8 digest bytes as an
    * unsigned big-endian 64-bit value, shifted right 4 (asserted against
    * the SQL form in OpsSpec).
    */
  def hash60(w: UTF8String): Long = {
    val md = Md5.get()
    md.reset()
    val d = md.digest(w.getBytes)
    val v = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    v >>> 4
  }

  /** SimHash of a text: per bit j, the sign of the ±1 vote sum over bit
    * j of each word's [[hash60]]; every word votes, duplicates included
    * (same as `transform(split(text), portableHash)` + per-bit
    * `aggregate` folds).
    */
  def compute(text: UTF8String, bits: Int): Long = {
    val words = text.split(Space, -1)
    val votes = new Array[Int](bits)
    var i = 0
    while (i < words.length) {
      val h = hash60(words(i))
      var j = 0
      while (j < bits) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

/** `SimhashOfText(text, bits)` ≡ [[Dedup.simhashOfHashes]] over
  * `transform(words(text), portableHash)` — as ONE codegen'd expression:
  * one md5 per word feeding all `bits` vote counters in a single pass,
  * instead of `bits` eval-only `aggregate` folds that box every element
  * and drop the stage out of whole-stage codegen.
  *
  * Null semantics follow the HOF form exactly: a null text yields 0L
  * (each per-bit `when(votes > 0, …).otherwise(0)` takes the otherwise
  * branch on a null fold), so the expression is non-nullable.
  */
case class SimhashOfText(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 60, s"simhash bits must be in [1,60], got $bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash expects string, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    if (t == null) 0L
    else SimhashUtil.compute(t.asInstanceOf[UTF8String], bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val code =
      code"""
        ${c.code}
        long ${ev.value} = ${c.isNull} ? 0L :
          graft.ops.SimhashUtil.compute(${c.value}, $bits);
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
