package graft.ops

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `IvfProbes(vec)` → the `nprobe` IVF cell ids nearest to `vec`, by
  * (cosine desc, cid asc) — the coarse-quantizer assignment of both
  * corpus rows (`nprobe = 1`) and queries (`nprobe ≥ 1`).
  *
  * The centroid matrix is a plan constant carried INSIDE the expression
  * (one codegen reference object), not as literal sub-expressions: the
  * previous `array_min` / `array_sort` forms built one struct + one dot
  * sub-tree per centroid, so plan analysis + codegen grew linearly in
  * |centroids| and dominated wall time (measured at 33 centroids:
  * 5.8 s first run / 2.7 s per fresh plan vs 0.3 s execution) — and the
  * production cell counts this quantizer targets (2^10..2^16) would be
  * unplannable. Here the plan holds ONE node regardless of cell count
  * and the scan loop is fully codegen'd.
  *
  * Ordering: scores are compared as `dot(v,c)/|c|` — the query-side norm
  * `1/|v|` is a positive per-row constant that cannot change the
  * ranking, so it is not computed. Ties on score break by ascending cid;
  * an all-zero vector scores 0.0 against every centroid and selects the
  * lowest cids, matching the previous NaN-cosine tie behavior; a
  * zero-norm CENTROID scores NaN and is never selected. A vector whose
  * length differs from the centroid dimension, or containing a null
  * element, yields null.
  */
case class IvfProbes(child: Expression, cids: Array[Long],
    centroids: Array[Array[Double]], nprobe: Int) extends UnaryExpression {

  require(cids.length == centroids.length && cids.nonEmpty, "non-empty centroid set")
  require(nprobe >= 1 && nprobe <= cids.length, s"nprobe in [1, ${cids.length}]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ivf_probes"

  private val dim = centroids(0).length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivf_probes expects array<float|double>, got ${other.simpleString}")
  }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  private lazy val elemNullable = child.dataType match {
    case ArrayType(_, n) => n
  }

  /** Flat row-major centroid matrix + per-centroid norms, shared by eval
    * and codegen (via reference objects).
    */
  lazy val flat: Array[Double] = centroids.flatten
  lazy val cnorms: Array[Double] =
    centroids.map(c => math.sqrt(c.map(x => x * x).sum))

  /** Top-`nprobe` selection shared by eval and codegen: bounded insertion
    * by (score desc, cid asc).
    */
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val vd = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (elemNullable && v.isNullAt(i)) return null
      vd(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val topIds = new Array[Long](nprobe)
    val topScores = new Array[Double](nprobe)
    var filled = 0
    var c = 0
    while (c < cids.length) {
      var s = 0.0
      var j = 0
      val off = c * dim
      while (j < dim) { s += vd(j) * flat(off + j); j += 1 }
      s = s / cnorms(c)
      // NaN score (zero-norm centroid, 0/0): never selected — NaN also
      // never won under the previous when(cos > best) form, and a NaN in
      // the buffer would block later insertions (all NaN compares false)
      if (s == s) {
        // insertion position: after all entries strictly better than
        // (s, cid) under (score desc, cid asc)
        var pos = filled
        while (pos > 0 && (topScores(pos - 1) < s ||
            (topScores(pos - 1) == s && topIds(pos - 1) > cids(c)))) pos -= 1
        if (pos < nprobe) {
          val last = math.min(filled, nprobe - 1)
          var k = last
          while (k > pos) { topScores(k) = topScores(k - 1); topIds(k) = topIds(k - 1); k -= 1 }
          topScores(pos) = s
          topIds(pos) = cids(c)
          if (filled < nprobe) filled += 1
        }
      }
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(topIds, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("ivfFlat", flat, "double[]")
    val cnRef = ctx.addReferenceObj("ivfCn", cnorms, "double[]")
    val cidRef = ctx.addReferenceObj("ivfCids", cids, "long[]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, vec => {
      val vd = ctx.freshName("vd")
      val ids = ctx.freshName("ids")
      val scs = ctx.freshName("scs")
      val filled = ctx.freshName("filled")
      val c = ctx.freshName("c")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      val pos = ctx.freshName("pos")
      val k = ctx.freshName("k")
      val last = ctx.freshName("last")
      s"""
         |if ($vec.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double[] $vd = new double[$dim];
         |  for (int $j = 0; $j < $dim; $j++) {
         |    ${if (elemNullable) s"if ($vec.isNullAt($j)) { ${ev.isNull} = true; break; }" else ""}
         |    $vd[$j] = (double) $vec.$getter($j);
         |  }
         |  if (!${ev.isNull}) {
         |  final long[] $ids = new long[$nprobe];
         |  final double[] $scs = new double[$nprobe];
         |  int $filled = 0;
         |  for (int $c = 0; $c < ${cids.length}; $c++) {
         |    double $s = 0.0;
         |    final int $off = $c * $dim;
         |    for (int $j = 0; $j < $dim; $j++) $s += $vd[$j] * $flatRef[$off + $j];
         |    $s = $s / $cnRef[$c];
         |    if ($s != $s) continue; // NaN (zero-norm centroid): never selected
         |    int $pos = $filled;
         |    while ($pos > 0 && ($scs[$pos - 1] < $s ||
         |        ($scs[$pos - 1] == $s && $ids[$pos - 1] > $cidRef[$c]))) $pos--;
         |    if ($pos < $nprobe) {
         |      final int $last = Math.min($filled, $nprobe - 1);
         |      for (int $k = $last; $k > $pos; $k--) {
         |        $scs[$k] = $scs[$k - 1]; $ids[$k] = $ids[$k - 1];
         |      }
         |      $scs[$pos] = $s;
         |      $ids[$pos] = $cidRef[$c];
         |      if ($filled < $nprobe) $filled++;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray(java.util.Arrays.copyOf($ids, $filled));
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
