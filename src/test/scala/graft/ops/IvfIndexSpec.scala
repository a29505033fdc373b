package graft.ops

import graft.SparkSessionTestWrapper
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The materialized IVF index: cell-partitioned parquet where probing is
  * storage-level partition pruning, not a filter over a full scan.
  */
class IvfIndexSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private lazy val vecs = (0 until 60).map(i =>
    (i.toLong, Array((math.cos(i * 0.7) * (1 + i % 4)).toFloat,
      (math.sin(i * 0.7) * (1 + i % 4)).toFloat)))
    .toDF("vec_id", "embedding").repartition(5)
  private lazy val cents =
    Similarity.corpusCentroids(vecs, "vec_id", "embedding", every = 13L)
  private lazy val queries = vecs.where(col("vec_id") % 19 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  test("ivfTopKIndexed over the cell-partitioned index ≡ in-memory ivfTopK") {
    val idx = Files.createTempDirectory("graft_ivf_idx").toString
    Similarity.ivfWriteIndex(vecs, "embedding", cents, idx)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    for (nprobe <- Seq(2, cents.length)) {
      val mem = rows(Similarity.ivfTopK(vecs, "vec_id", "embedding",
        queries, "qid", "qvec", 3, cents, nprobe))
      val ind = rows(Similarity.ivfTopKIndexed(spark, idx, "vec_id", "embedding",
        queries, "qid", "qvec", 3, cents, nprobe))
      assert(ind == mem, s"nprobe=$nprobe")
    }
  }

  test("ivfPqTopKIndexed over the (cell, codes) index ≡ in-memory ivfPqTopK; index holds no raw vectors") {
    val idx = Files.createTempDirectory("graft_ivfpq_idx").toString
    val cb = Similarity.pqCodebook(vecs, "vec_id", "embedding", every = 7L)
    Similarity.ivfPqWriteIndex(vecs, "vec_id", "embedding", cents, cb, nSub = 2, idx)
    // the stored index is keys + codes only — the raw vectors never land
    val stored = spark.read.parquet(idx)
    assert(stored.columns.toSet == Set("vec_id", "_codes", "_cell"), stored.columns.mkString(","))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    for (nprobe <- Seq(2, cents.length)) {
      val mem = rows(Similarity.ivfPqTopK(vecs, "vec_id", "embedding",
        queries, "qid", "qvec", 3, cents, nprobe, cb, nSub = 2))
      val ind = rows(Similarity.ivfPqTopKIndexed(spark, idx, "vec_id",
        queries, "qid", "qvec", 3, cents, nprobe, cb, nSub = 2))
      assert(ind == mem, s"nprobe=$nprobe")
    }
  }

  test("refineCentroids: one Lloyd iteration lands on exact cluster means, ids and empty cells preserved") {
    // two tight clusters around (10,0) and (0,10); the subsample
    // codebook picks one member of each (vec_id 0 and 5) plus nothing
    // for a third id — refinement must move each centroid to its
    // assignees' exact coordinate mean and keep an empty cell unchanged
    val pts = Seq(
      (0L, Array(10.0f, 0.2f)), (1L, Array(10.0f, -0.2f)),
      (2L, Array(12.0f, 0.0f)), (3L, Array(8.0f, 0.0f)),
      (5L, Array(0.2f, 10.0f)), (6L, Array(-0.2f, 10.0f)),
      (7L, Array(0.0f, 12.0f)), (8L, Array(0.0f, 8.0f))
    ).toDF("vec_id", "embedding").repartition(3)
    val cents = Array(
      (0L, Array(10.0, 0.2)), (5L, Array(0.2, 10.0)),
      (99L, Array(-5.0, -5.0))) // cosine-dominated by the others → empty
    val refined = Similarity.refineCentroids(pts, "embedding", cents).toMap
    def mean(ids: Set[Long]): Array[Double] = {
      val vs = pts.collect().filter(r => ids(r.getLong(0)))
        .map(_.getSeq[Float](1).map(_.toDouble).toArray)
      Array.tabulate(2)(d => vs.map(_(d)).sum / vs.length)
    }
    assert(refined(0L).toSeq == mean(Set(0L, 1L, 2L, 3L)).toSeq)
    assert(refined(5L).toSeq == mean(Set(5L, 6L, 7L, 8L)).toSeq)
    assert(refined(99L).toSeq == Seq(-5.0, -5.0), "empty cell keeps its centroid")

    // refinement reduces (or preserves) quantization error — Lloyd's
    // monotonicity, here strictly: the initial centroids are corpus
    // points, not means
    def sse(cs: Array[(Long, Array[Double])]): Double =
      pts.collect().map { r =>
        val v = r.getSeq[Float](1).map(_.toDouble).toArray
        cs.map(c => c._2.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum).min
      }.sum
    assert(sse(cents.map { case (i, v) => (i, refined(i)) }) < sse(cents))
  }

  test("probing the index is partition pruning: the scan lists only probed directories") {
    val idx = Files.createTempDirectory("graft_ivf_idx2").toString
    Similarity.ivfWriteIndex(vecs, "embedding", cents, idx)
    val cells = Similarity.probeCells(queries, "qvec", cents, nprobe = 2)
    assert(cells.nonEmpty && cells.length < cents.length,
      "the probe set must be a strict subset of cells for pruning to mean anything")

    val scan = Similarity.indexScan(spark, idx, cells)
    val fileScans = scan.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(fileScans.nonEmpty)
    val fs = fileScans.head
    assert(fs.partitionFilters.nonEmpty,
      "the _cell predicate must land in PartitionFilters, not a post-scan Filter")
    // listing honors the pruning: exactly the probed directories survive
    assert(fs.selectedPartitions.partitionCount == cells.length)
    // and the rows read are exactly those cells' rows
    // partition-column values are int-inferred from directory names
    val gotCells = scan.select(col("_cell").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    assert(gotCells.sameElements(cells))
  }
}
