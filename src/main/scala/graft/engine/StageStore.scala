package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/** Stage-granularity checkpoint seam for multi-stage pipelines — the
  * [[TableIO]] commit discipline generalized from partition commit
  * units to PIPELINE STAGES (SURVEY.md §7.1's resume story applied to
  * the assembly run): each stage's output lands durably as an
  * IDEMPOTENT overwrite, its count metadata commits LAST, and a stage
  * is complete iff its commit marker exists — an interrupted stage
  * re-runs wholesale on resume, completed stages are read back from
  * storage (their counts from the marker), later stages proceed
  * normally. This is the production run's parquet-between-stages;
  * `AssemblyPipeline`'s in-memory `localCheckpoint` boundaries remain
  * the store-less fast path.
  */
trait StageStore {
  /** The counts the commit recorded, iff the stage is complete. */
  def completed(stage: String): Option[Map[String, Long]]
  /** Durable idempotent overwrite of one stage's output. */
  def write(stage: String, df: DataFrame): Unit
  /** Read back a stage's stored output. */
  def read(stage: String): DataFrame
  /** Commit point: record the stage's counts. MUST be the last write. */
  def commit(stage: String, counts: Map[String, Long]): Unit
}

/** Parquet + marker-file [[StageStore]] (the in-sandbox stand-in for an
  * Iceberg table per stage, same rationale as [[ParquetManifestIO]]).
  * The commit marker is written to a temp file and atomically moved, so
  * a crash mid-commit leaves the stage uncommitted (re-run wholesale),
  * never half-committed.
  */
final class ParquetStageStore(spark: SparkSession, dir: String) extends StageStore {
  private def outPath(stage: String) = s"$dir/$stage"
  private def marker(stage: String) = Paths.get(s"$dir/_committed_$stage")

  override def completed(stage: String): Option[Map[String, Long]] =
    if (!Files.exists(marker(stage))) None
    else Some(
      new String(Files.readAllBytes(marker(stage)), StandardCharsets.UTF_8)
        .linesIterator.filter(_.nonEmpty).map { line =>
          val Array(k, v) = line.split("=", 2)
          k -> v.toLong
        }.toMap)

  override def write(stage: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(outPath(stage))

  override def read(stage: String): DataFrame =
    spark.read.parquet(outPath(stage))

  override def commit(stage: String, counts: Map[String, Long]): Unit = {
    Files.createDirectories(Paths.get(dir))
    val tmp = Paths.get(s"$dir/_tmp_commit_$stage")
    Files.write(tmp, counts.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, marker(stage), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
