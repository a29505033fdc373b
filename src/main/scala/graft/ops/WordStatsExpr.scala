package graft.ops

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for [[WordStats]], callable from generated code. One instance
  * per expression (driver-built, serialized to executors as a codegen
  * reference object) holds the word sets as UTF8String hash sets so the
  * per-word work is one hash probe per set, no string decoding.
  */
final class WordStatsKernel(stopwords: Seq[String], markers: Seq[Seq[String]],
    prime: Long) extends Serializable {
  private val Space = UTF8String.fromString(" ")

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  @transient private lazy val markerSets: Array[java.util.HashSet[UTF8String]] =
    markers.map { ws =>
      val s = new java.util.HashSet[UTF8String]()
      ws.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  val nLangs: Int = markers.length

  /** One pass over the words of `text`: word count, stopword hits,
    * marker hits per language, and the rolling polynomial fingerprint
    * `h = (h*31 + hash60(w) mod p) mod p` — the fused form of four
    * separate `filter`/`aggregate` HOF folds, one split and one md5 per
    * word total. Layout: `[nWords, nStop, hits(0..L-1), rollingFp]`.
    */
  def compute(text: UTF8String): ArrayData = {
    val words = text.split(Space, -1)
    val sets = markerSets
    val hits = new Array[Long](sets.length)
    var nStop = 0L
    var rolling = 0L
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (stopSet.contains(w)) nStop += 1
      var l = 0
      while (l < sets.length) {
        if (sets(l).contains(w)) hits(l) += 1
        l += 1
      }
      // acc < p (~2^30) so acc*31 + hash < 2^35 — overflow-free, same
      // long arithmetic as the declarative aggregate() fold
      rolling = (rolling * 31L + SimhashUtil.hash60(w) % prime) % prime
      i += 1
    }
    val out = new Array[Long](2 + sets.length + 1)
    out(0) = words.length.toLong
    out(1) = nStop
    System.arraycopy(hits, 0, out, 2, sets.length)
    out(2 + sets.length) = rolling
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `WordStats(text)` — the fused text-scan kernel: word count, stopword
  * hits, per-language marker hits, and the rolling fingerprint in ONE
  * codegen'd pass (one `split`, one md5 per word), as an
  * `array<long>` `[nWords, nStop, hits(0..L-1), rollingFp]`.
  *
  * Replaces four separate `filter`/`aggregate` higher-order-function
  * folds on the corpus-scan hot paths ([[TextOps.qualityFeatures]],
  * [[TextOps.langId]], [[TextOps.rollingFingerprint]]): HOFs are
  * eval-only in Spark — one in a projection drops the WHOLE stage out of
  * whole-stage codegen and boxes every element — and each fold re-split
  * the text. The declarative forms are retained as `*Ref` differential
  * oracles in [[TextOps]], asserted equal by OpsSpec.
  *
  * Null semantics follow the HOF forms: null text → null (every
  * downstream derivation then nulls out exactly as `size(split(null))`
  * does).
  */
case class WordStats(child: Expression, stopwords: Seq[String],
    markers: Seq[Seq[String]], prime: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_stats expects string, got ${other.simpleString}")
  }

  @transient private lazy val kernel = new WordStatsKernel(stopwords, markers, prime)

  override def nullSafeEval(t: Any): Any =
    kernel.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("wordStatsKernel", kernel, classOf[WordStatsKernel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $k.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
