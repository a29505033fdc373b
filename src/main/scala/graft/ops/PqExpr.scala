package graft.ops

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization kernels for the ANN scale path: a vector is
  * split into `nSub` contiguous subvectors and each subvector is
  * replaced by the index of its nearest codeword — 10^12 embeddings
  * become `nSub` small ints each (8 bytes at nSub=8), and query scoring
  * works on codes without touching the original vectors (ADC,
  * asymmetric distance computation).
  *
  * The codebook is carried as ONE plan constant, the [[IvfProbes]]
  * design: `flat` holds the sampled codeword vectors row-major at FULL
  * dimension, and subspace s of codeword c is the slice
  * `flat[c*dim + s*subDim ..)`. Plan size and codegen size are
  * independent of the codeword count.
  *
  * Both kernels null-propagate: a null array, a null element, or a
  * length/shape mismatch yields null.
  */
object Pq {
  /** Shared argmin: nearest codeword (L2, ties to the lowest index) of
    * subspace `s` of `v` — the eval-path reference shared with tests.
    */
  def nearestCodeword(v: Array[Double], s: Int, flat: Array[Double],
      dim: Int, subDim: Int): Int = {
    val nCw = flat.length / dim
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < nCw) {
      var d = 0.0
      var j = 0
      while (j < subDim) {
        val diff = v(s * subDim + j) - flat(c * dim + s * subDim + j)
        d += diff * diff
        j += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }
}

/** `PqEncode(vec)` → `array<int>` of length `nSub`: per subspace, the
  * index of the L2-nearest codeword (ties to the lowest index).
  */
case class PqEncode(child: Expression, flat: Array[Double], dim: Int,
    nSub: Int) extends UnaryExpression {

  require(dim % nSub == 0, s"dim $dim not divisible by nSub $nSub")
  require(flat.nonEmpty && flat.length % dim == 0, "codebook shape")
  private val subDim = dim / nSub
  private val nCw = flat.length / dim

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float|double>, got ${other.simpleString}")
  }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  private lazy val elemNullable = child.dataType match {
    case ArrayType(_, n) => n
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != dim) return null
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (elemNullable && a.isNullAt(i)) return null
      v(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    val codes = new Array[Int](nSub)
    var s = 0
    while (s < nSub) {
      codes(s) = Pq.nearestCodeword(v, s, flat, dim, subDim)
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, vec => {
      val v = ctx.freshName("v")
      val codes = ctx.freshName("codes")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |if ($vec.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double[] $v = new double[$dim];
         |  for (int $i = 0; $i < $dim; $i++) {
         |    ${if (elemNullable) s"if ($vec.isNullAt($i)) { ${ev.isNull} = true; break; }" else ""}
         |    $v[$i] = (double) $vec.$getter($i);
         |  }
         |  if (!${ev.isNull}) {
         |  final int[] $codes = new int[$nSub];
         |  for (int $s = 0; $s < $nSub; $s++) {
         |    int $best = 0; double $bestD = Double.POSITIVE_INFINITY;
         |    for (int $c = 0; $c < $nCw; $c++) {
         |      double $d = 0.0;
         |      for (int $j = 0; $j < $subDim; $j++) {
         |        final double $diff = $v[$s * $subDim + $j] - $flatRef[$c * $dim + $s * $subDim + $j];
         |        $d += $diff * $diff;
         |      }
         |      if ($d < $bestD) { $bestD = $d; $best = $c; }
         |    }
         |    $codes[$s] = $best;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($codes);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `PqAdc(qvec, codes)` → double: the asymmetric inner product of a
  * query vector against a PQ-encoded corpus vector —
  * `sum_s dot(q_sub(s), codeword(codes[s], s))`, accumulated in flat
  * index order (identical summation order to a full-vector dot against
  * the reconstruction, so it is bit-equal to `DotProd(q, reconstruct)`).
  */
case class PqAdc(left: Expression, right: Expression, flat: Array[Double],
    dim: Int, nSub: Int) extends BinaryExpression {

  require(dim % nSub == 0, s"dim $dim not divisible by nSub $nSub")
  private val subDim = dim / nSub
  private val nCw = flat.length / dim

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects (array<float|double>, array<int>), got $other")
  }

  private lazy val isFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  private lazy val qNulls = left.dataType match { case ArrayType(_, n) => n }
  private lazy val cNulls = right.dataType match { case ArrayType(_, n) => n }

  override def nullSafeEval(x: Any, y: Any): Any = {
    val q = x.asInstanceOf[ArrayData]
    val codes = y.asInstanceOf[ArrayData]
    if (q.numElements() != dim || codes.numElements() != nSub) return null
    var sum = 0.0
    var s = 0
    while (s < nSub) {
      if (cNulls && codes.isNullAt(s)) return null
      val c = codes.getInt(s)
      if (c < 0 || c >= nCw) return null
      var j = 0
      while (j < subDim) {
        val i = s * subDim + j
        if (qNulls && q.isNullAt(i)) return null
        val qi = if (isFloat) q.getFloat(i).toDouble else q.getDouble(i)
        sum += qi * flat(c * dim + i)
        j += 1
      }
      s += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (qv, cv) => {
      val sum = ctx.freshName("sum")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val qNullCheck =
        if (qNulls) s"if ($qv.isNullAt($i)) { ${ev.isNull} = true; break; }" else ""
      val cNullCheck =
        if (cNulls) s"if ($cv.isNullAt($s)) { ${ev.isNull} = true; break; }" else ""
      s"""
         |if ($qv.numElements() != $dim || $cv.numElements() != $nSub) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $s = 0; $s < $nSub; $s++) {
         |    $cNullCheck
         |    final int $c = $cv.getInt($s);
         |    if ($c < 0 || $c >= $nCw) { ${ev.isNull} = true; break; }
         |    for (int $j = 0; $j < $subDim; $j++) {
         |      final int $i = $s * $subDim + $j;
         |      $qNullCheck
         |      $sum += ((double) $qv.$getter($i)) * $flatRef[$c * $dim + $i];
         |    }
         |    if (${ev.isNull}) break;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $sum;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
