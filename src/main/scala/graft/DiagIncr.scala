package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextOps}

/** Round-6 bisect of the incremental-probe cost (dedup_exact_incr):
  * times each phase — the eager probe job, the pruned index read, the
  * semi join, the window attach — in isolation. Measurement only.
  */
object DiagIncr {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .appName("diag-incr")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d0 = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    val docs = d0.union(d0.where(col("doc_id") % 13 === 2)
      .select((col("doc_id") + 1000007L).as("doc_id"), col("text")))
    val newB = docs.where(col("doc_id") % 10 === 7)
    val oldB = docs.where(col("doc_id") % 10 =!= 7)
    val path = "/tmp/diag_incr_fp_index"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_SUCCESS")))
      Dedup.exactWriteIndex(oldB, "doc_id", "text", path)

    def newRows = newB
      .select(unhex(TextOps.fingerprint(col("text"))).as("fp"), col("doc_id").as("id"))
      .where(col("fp").isNotNull)
      .withColumn("_pb", pmod(xxhash64(col("fp")), lit(256L)))

    def timeIt(name: String)(body: => Unit): Unit = {
      body
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[diagincr] $name%-26s min=${ts.head}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    timeIt("probe_limit_collect") {
      newRows.select("fp", "_pb").distinct().limit(65537).collect(): Unit
    }
    timeIt("batch_rows_noop") { noop(newRows) }
    timeIt("index_read") { noop(spark.read.parquet(path)) }
    timeIt("index_read_pruned") {
      val pbs = (0L until 256L)
      noop(spark.read.parquet(path).where(col("_pb").cast("long").isin(pbs: _*)))
    }
    timeIt("full_op") { noop(Dedup.exactIncrementalDuplicates(spark, path, newB, "doc_id", "text")) }

    // hypothesis: the 0.7 s index read is the PARALLEL partition-
    // discovery job (257 paths > threshold 32 → one distributed listing
    // job per spark.read); sequential driver listing of a local-FS dir
    // should be milliseconds
    spark.conf.set("spark.sql.sources.parallelPartitionDiscovery.threshold", "1024")
    timeIt("index_read_seq_listing") { noop(spark.read.parquet(path)) }
    timeIt("full_op_seq_listing") { noop(Dedup.exactIncrementalDuplicates(spark, path, newB, "doc_id", "text")) }
    spark.conf.set("spark.sql.sources.parallelPartitionDiscovery.threshold", "32")
    spark.stop()
  }
}
