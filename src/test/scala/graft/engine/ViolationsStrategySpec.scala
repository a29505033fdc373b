package graft.engine

import graft.SparkSessionTestWrapper
import graft.compile.SpecCompiler
import graft.spec.SchemaParser
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.JsonToStructs
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, MapType, StringType}
import org.scalatest.funsuite.AnyFunSuite

/** The violations explode strategy is conditional (round-3 verdict
  * finding #1): plain typed specs take the `where(!valid)` + plain
  * `explode` fast path (passing rows never reach the Generate — the
  * ~1.5× constant-factor tax of unconditional explode_outer on clean
  * tables); specs over expensive parsed aliases (`from_json`) keep the
  * outer form so predicate pushdown cannot re-evaluate the parse inside
  * a Filter. Both paths must return identical rows.
  */
class ViolationsStrategySpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private val plainSpec = SchemaParser.parse(
    """{"type": "object", "properties": {
         "a": {"type": "integer", "required": true, "minimum": 0},
         "s": {"type": "string", "minLength": 2}
       }}""")

  private def plainDf: DataFrame =
    Seq((1L, Some(5L), "ok"), (2L, Some(-3L), "x"), (3L, None, "yy"))
      .toDF("id", "a", "s")

  // Range-based (not a LocalRelation) so the optimizer cannot
  // constant-fold the parse away: k = 45*id - 42 → 3, 48, 93
  private def parsedDf: DataFrame =
    spark.range(1, 4).select(col("id"),
      from_json(concat(lit("{\"k\": "), (col("id") * 45 - 42).cast("string"), lit("}")),
        MapType(StringType, LongType)).as("m"))

  private val mapSpec = SchemaParser.parse(
    """{"type": "object",
       "properties": {"k": {"type": "integer", "required": true, "minimum": 10, "maximum": 90}}}""")

  private def generateOuterFlags(plan: LogicalPlan): Seq[Boolean] =
    plan.collect { case g: Generate => g.outer }

  private def countJsonParses(plan: LogicalPlan): Int =
    plan.collect { case n =>
      n.expressions.map { e =>
        var c = 0
        e.foreach { case _: JsonToStructs => c += 1; case _ => () }
        c
      }.sum
    }.sum

  test("plain typed spec takes the pre-filter + plain explode fast path") {
    val ann = ValidationEngine.annotate(plainDf, plainSpec)
    assert(ValidationEngine.prefilterIsCheap(ann), ValidationEngine.debugValidExpr(ann))
    val v = ValidationEngine.violationsWith(ann, Seq("id"))
    val flags = generateOuterFlags(v.queryExecution.optimizedPlan)
    assert(flags == Seq(false), s"expected one non-outer Generate, got $flags")
    assert(v.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
      Seq((2L, "$.a.minimum"), (2L, "$.s.minLength"), (3L, "$.a.required")))
  }

  test("from_json spec keeps the outer form and parses exactly once") {
    val ann = ValidationEngine.annotateWith(parsedDf,
      SpecCompiler.compileColumn(mapSpec, MapType(StringType, LongType), col("m"), "$"))
    assert(!ValidationEngine.prefilterIsCheap(ann))
    val v = ValidationEngine.violationsWith(ann, Seq("id"))
    val opt = v.queryExecution.optimizedPlan
    val flags = generateOuterFlags(opt)
    assert(flags == Seq(true), s"expected one outer Generate, got $flags")
    // the pushdown-tax regression this strategy exists to prevent: the
    // parse must appear ONCE in the optimized plan, never duplicated
    // into a pushed filter
    assert(countJsonParses(opt) == 1,
      s"from_json must be evaluated once; plan:\n$opt")
    assert(v.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
      Seq((1L, "$.k.minimum"), (3L, "$.k.maximum")))
  }

  test("array-items and regex specs take the outer form (cheapness is a whitelist)") {
    // tuple/array item checks compile to forall (eval-only HOF) or
    // O(|array|) walks — evaluating them twice in a pushed filter was
    // the round-4 bench regression (val_tuple_items 0.21 → 1.00 s)
    val arrSpec = SchemaParser.parse(
      """{"type": "object", "properties": {
           "xs": {"type": "array", "items": [{"type": "integer", "minimum": 0},
                                             {"type": "integer"}]}
         }}""")
    val arrDf = Seq((1L, Seq(1, 2)), (2L, Seq(-5, 3))).toDF("id", "xs")
    val annArr = ValidationEngine.annotate(arrDf, arrSpec)
    assert(!ValidationEngine.prefilterIsCheap(annArr))
    assert(generateOuterFlags(ValidationEngine.violationsWith(annArr, Seq("id"))
      .queryExecution.optimizedPlan) == Seq(true))

    // regex containment over document-sized strings: same rule
    val reSpec = SchemaParser.parse(
      """{"type": "object", "properties": {
           "s": {"type": "string", "pattern": "^src[0-9]$"}
         }}""")
    val annRe = ValidationEngine.annotate(plainDf, reSpec)
    assert(!ValidationEngine.prefilterIsCheap(annRe))

    // …while enum/bounds/integer-ness stay on the fast path
    val evSpec = SchemaParser.parse(graft.SparkEntry.EventsSpecJson)
    val evDf = Seq((1L, 2.0, 3L, "click")).toDF("event_id", "value", "user_id", "event_type")
    assert(ValidationEngine.prefilterIsCheap(ValidationEngine.annotate(evDf, evSpec)))
  }

  test("fast-path violations plan is ONE whole-stage-codegen span, scan to output") {
    // the property the concat-form violationsArray exists for: no
    // eval-only HOF anywhere in the plan, so the scan → filter →
    // violations projection → generate → output chain compiles into a
    // single codegen span (measured: val_events_spec 1.12 → 0.40 s).
    // A regression that reintroduces an interpreted node here splits
    // the span and this count changes.
    import org.apache.spark.sql.execution.{FilterExec, GenerateExec, ProjectExec, WholeStageCodegenExec}
    // range-based input so ConvertToLocalRelation cannot fold the plan
    val df = spark.range(1, 100).select(col("id"),
      (col("id") * 7 - 350).as("a"), concat(lit("s"), col("id")).as("s"))
    val ann = ValidationEngine.annotate(df, plainSpec)
    val v = ValidationEngine.violationsWith(ann, Seq("id"))
    val exec = v.queryExecution.executedPlan
    val spans = exec.collect { case w: WholeStageCodegenExec => w }
    assert(spans.length == 1, s"expected one codegen span, plan:\n$exec")
    // the generate and every project/filter sit INSIDE that span
    assert(spans.head.exists(_.isInstanceOf[GenerateExec]),
      s"Generate fell out of codegen:\n$exec")
    def insideSpan(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      spans.head.exists(_ eq p)
    val strays = exec.collect {
      case p: ProjectExec if !insideSpan(p) => p
      case p: FilterExec if !insideSpan(p) => p
      case p: GenerateExec if !insideSpan(p) => p
    }
    assert(strays.isEmpty,
      s"interpreted Project/Filter/Generate outside the codegen span:\n$exec")
  }

  test("both strategies return identical rows on the same annotated frame") {
    val ann = ValidationEngine.annotate(plainDf, plainSpec)
    val fast = ValidationEngine.violationsWith(ann, Seq("id"))
    // the outer form, built manually (what the engine would do if the
    // plan carried expensive aliases)
    val outer = ann
      .select(col("id"), explode_outer(col(ValidationEngine.ViolationsCol)).as("v"))
      .where(col("v").isNotNull)
      .select(col("id"), col("v.constraint_id").as("constraint_id"),
        col("v.offending").as("offending"))
    assert(fast.collect().map(_.toString).sorted.toSeq ==
      outer.collect().map(_.toString).sorted.toSeq)
  }
}
