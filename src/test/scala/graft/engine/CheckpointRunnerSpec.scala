package graft.engine

import graft.SparkSessionTestWrapper
import graft.gen.SequenceGen
import graft.spec.SchemaParser
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Partition-granularity checkpoint/resume — the north-rule requirement:
  * a simulated interrupt (`limit`) commits a prefix of partitions;
  * resume processes ONLY the remainder; a third run processes nothing;
  * outputs are idempotent and, unioned across partitions, identical to
  * a single global validation pass.
  */
class CheckpointRunnerSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private lazy val spec = SchemaParser.parse(graft.Main.builtinSpec)

  private def violationSet(dir: String): Set[(String, String)] = {
    val f = new java.io.File(dir)
    if (!f.exists()) Set.empty
    else spark.read.option("basePath", dir).parquet(dir)
      .select("doc_id", "constraint_id").collect()
      .map(r => (Option(r.getString(0)).getOrElse("<null>"), r.getString(1))).toSet
  }

  test("interrupt after 3 partitions, resume runs only the rest, third run is a no-op") {
    val out = Files.createTempDirectory("graft_ckpt").toString
    val df = SequenceGen.generate(spark, 5000)
    val runner = new CheckpointRunner(spark, out)

    val first = runner.run(df, spec, "doc_id", "source", limit = Some(3))
    assert(first.size == 3)
    assert(runner.completedPartitions() == first.map(_.partition).toSet)

    val second = runner.run(df, spec, "doc_id", "source")
    assert(second.map(_.partition).toSet.intersect(first.map(_.partition).toSet).isEmpty,
      "resume must not re-run committed partitions")
    val allParts = (first ++ second).map(_.partition).toSet
    assert(runner.completedPartitions() == allParts)

    val third = runner.run(df, spec, "doc_id", "source")
    assert(third.isEmpty, "fully-committed run must process zero partitions")

    // the union of per-partition outputs equals one global pass
    val global = ValidationEngine.violations(df, spec, Seq("doc_id"))
      .select("doc_id", "constraint_id").collect()
      .map(r => (Option(r.getString(0)).getOrElse("<null>"), r.getString(1))).toSet
    assert(violationSet(s"$out/violations") == global)

    // metrics cover every row exactly once
    assert((first ++ second).map(_.nRows).sum == 5000L)
  }

  test("re-running a committed partition is idempotent (same violations, same metrics)") {
    val df = SequenceGen.generate(spark, 3000)
    val outA = Files.createTempDirectory("graft_ckpt_a").toString
    val outB = Files.createTempDirectory("graft_ckpt_b").toString
    val a = new CheckpointRunner(spark, outA).run(df, spec, "doc_id", "source", limit = Some(1))
    val b = new CheckpointRunner(spark, outB).run(df, spec, "doc_id", "source", limit = Some(1))
    assert(a == b, "same input partition must commit identical metrics")
    val p = a.head.partition
    assert(violationSet(s"$outA/violations/part=$p") == violationSet(s"$outB/violations/part=$p"))

    // overwrite semantics: wiping the manifest and re-running the same
    // partition into the SAME directory leaves identical outputs
    import scala.reflect.io.Directory
    new Directory(new java.io.File(s"$outA/_manifest")).deleteRecursively()
    val before = violationSet(s"$outA/violations/part=$p")
    val again = new CheckpointRunner(spark, outA).run(df, spec, "doc_id", "source", limit = Some(1))
    assert(again == a)
    assert(violationSet(s"$outA/violations/part=$p") == before)
  }
}
