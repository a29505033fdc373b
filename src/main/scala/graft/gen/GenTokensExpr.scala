package graft.gen

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** `GenTokens(id, len)` ≡ `transform(sequence(lit(0), len - 1), i =>
  * pmod(xxhash64(id, lit(seed), lit(salt), i), lit(vocab)).cast("int"))`
  * for `len ≥ 1` (the only reachable range in [[SequenceGen]] — the
  * empty case is a separate literal branch), with two hot-path savings
  * the declarative form can't express:
  *
  *   1. the xxhash64 chain over `(id, seed, salt)` is row-constant —
  *      hoisted out of the element loop, so each element costs ONE
  *      XXH64 round instead of four;
  *   2. one primitive `int[]` + `UnsafeArrayData` per row instead of
  *      sequence's `long[]` plus transform's boxed result.
  *
  * Fully codegen'd (`doGenCode`), so it stays inside whole-stage codegen
  * like any built-in. Byte-identical output to the declarative form is
  * asserted by `SequenceGenSpec`.
  */
case class GenTokens(left: Expression, right: Expression,
    seed: Long, salt: Int, vocab: Int) extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "gen_tokens"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.LongType
    if (left.dataType == LongType && right.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"gen_tokens expects (bigint, int), got (${left.dataType}, ${right.dataType})")
  }

  /** Row-constant hash prefix: 42 is `functions.xxhash64`'s fixed seed;
    * the literal `salt` is an int in the declarative form, so it goes
    * through the int round, while `seed` is a long literal.
    */
  private def prefix(id: Long): Long =
    XXH64.hashInt(salt, XXH64.hashLong(seed, XXH64.hashLong(id, 42L)))

  override def nullSafeEval(idAny: Any, lenAny: Any): Any = {
    val id = idAny.asInstanceOf[Long]
    val n = math.max(lenAny.asInstanceOf[Int], 0)
    val p = prefix(id)
    val arr = new Array[Int](n)
    var i = 0
    while (i < n) {
      val h = XXH64.hashInt(i, p)
      val m = h % vocab
      arr(i) = (if (m < 0) m + vocab else m).toInt
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (idv, lenv) => {
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val arr = ctx.freshName("arr")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val m = ctx.freshName("m")
      s"""
         |final int $n = $lenv > 0 ? $lenv : 0;
         |final long $p = $xxh.hashInt($salt,
         |  $xxh.hashLong(${seed}L, $xxh.hashLong($idv, 42L)));
         |final int[] $arr = new int[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $h = $xxh.hashInt($i, $p);
         |  long $m = $h % $vocab;
         |  if ($m < 0) $m += $vocab;
         |  $arr[$i] = (int) $m;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($arr);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
