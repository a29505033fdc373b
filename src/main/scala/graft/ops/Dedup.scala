package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design: signatures (minhash/simhash/fingerprints) are computed
  * per row with array expressions — no explode, no shuffle — so signature
  * generation is scan-bound. Candidate pairing shuffles only on the
  * band/bucket keys (LSH), never all-pairs: at 10^12 docs the only
  * all-pairs work happens inside LSH buckets, whose expected size is
  * controlled by the band/row parameters.
  */
object Dedup {

  import TextOps._

  /** Exact duplicate groups by normalized-content fingerprint: one row
    * per distinct content, with group size and the survivor (min key).
    * A single hash aggregation — partial map-side combine keeps shuffle
    * volume at one row per distinct fingerprint per task.
    */
  def exactGroups(df: DataFrame, keyCol: String, textCol: String): DataFrame =
    df.select(fingerprint(col(textCol)).as("fp"), col(keyCol))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col(keyCol)).as("keep_id"))

  /** Rows to drop under exact dedup (everything but the survivor). */
  def exactDuplicates(df: DataFrame, keyCol: String, textCol: String): DataFrame = {
    val groups = exactGroups(df, keyCol, textCol).where(col("n_docs") > 1)
    df.select(fingerprint(col(textCol)).as("fp"), col(keyCol))
      .join(groups, "fp")
      .where(col(keyCol) =!= col("keep_id"))
      .select(col(keyCol), col("keep_id"))
  }

  /** Word 3-gram shingles; docs shorter than 3 words use the whole text
    * as a single shingle (shared convention with the oracle SQL).
    */
  def shingles(text: Column): Column = {
    val w = words(text)
    when(size(w) >= 3,
      array_distinct(transform(sequence(lit(0), size(w) - 3),
        i => concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3)))))
      .otherwise(array(text))
  }

  /** Deterministic affine MinHash coefficients (shared with oracle SQL). */
  def minhashCoeffs(k: Int): Seq[(Long, Long)] =
    (0 until k).map(i => (2L * i + 3L, 104729L * (i + 1) % HashPrime))

  /** MinHash signature as `k` columns `m0..m{k-1}`: per hash function i,
    * min over shingles of `(a_i * bucketHash(s) + b_i) mod p`. Pure array
    * expressions — no explode, no shuffle.
    */
  def minhashSignature(df: DataFrame, keyCol: String, textCol: String, k: Int = 8): DataFrame = {
    // hash each shingle ONCE (md5 is the expensive part), then apply the
    // k affine transforms to the precomputed hash array
    val hs = transform(shingles(col(textCol)), s => bucketHash(s))
    val cols = minhashCoeffs(k).zipWithIndex.map { case ((a, b), i) =>
      array_min(transform(col("_hs"), h => (h * a + b) % HashPrime)).as(s"m$i")
    }
    df.withColumn("_hs", hs).select(col(keyCol) +: cols: _*)
  }

  /** LSH candidate pairs from minhash signatures: band the signature
    * (rows-per-band=2), self-join per band on the banded values, union,
    * dedup. The join shuffles on band values only — collision buckets,
    * not the corpus cross product.
    */
  def minhashCandidatePairs(sig0: DataFrame, keyCol: String, k: Int = 8,
      rowsPerBand: Int = 2): DataFrame = {
    // materialize signatures once — they are tiny (k+1 longs per doc) and
    // each band join would otherwise recompute the md5 pass over the corpus
    val sig = sig0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = (0 until k / rowsPerBand).map { b =>
      (0 until rowsPerBand).map(r => s"m${b * rowsPerBand + r}")
    }
    val pairs = bands.map { bandCols =>
      val l = sig.select(col(keyCol).as("a"), struct(bandCols.map(col): _*).as("band"))
      val r = sig.select(col(keyCol).as("b"), struct(bandCols.map(col): _*).as("band"))
      l.join(r, Seq("band")).where(col("a") < col("b")).select(col("a"), col("b"))
    }
    pairs.reduce(_ unionAll _).distinct()
  }

  /** SimHash (default 16 bits, portable to the oracle): for each bit j,
    * sum ±1 over word hashes' j-th bit; bit j of the result is the sign.
    */
  def simhash(text: Column, bits: Int = 16): Column = {
    val hs = transform(words(text), w => bucketHash(w))
    (0 until bits).map { j =>
      val votes = aggregate(hs, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(votes > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Hamming distance between two simhash values (bit-count of XOR). */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** n-gram Jaccard similarity pairs ≥ `threshold`: explode distinct
    * shingles, self-join on shingle (inverted index — shuffle is on
    * shingle keys), count intersections, compute |A∩B| / (|A|+|B|-|A∩B|).
    * At scale this runs AFTER LSH candidate filtering; standalone it is
    * the exact (quadratic-in-collisions) verification step.
    */
  def ngramJaccardPairs(df: DataFrame, keyCol: String, textCol: String,
      threshold: Double): DataFrame = {
    val withSh = df.select(col(keyCol).as("id"), shingles(col(textCol)).as("sh"))
      .withColumn("n_sh", size(col("sh")))
    val inv = withSh.select(col("id"), col("n_sh"), explode(col("sh")).as("s"))
    val l = inv.select(col("id").as("a"), col("n_sh").as("na"), col("s"))
    val r = inv.select(col("id").as("b"), col("n_sh").as("nb"), col("s"))
    l.join(r, Seq("s")).where(col("a") < col("b"))
      .groupBy(col("a"), col("b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")), 6))
      .where(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** Embedding cosine near-duplicate pairs within a blocking key (e.g. a
    * label or an LSH bucket): pairs with cosine ≥ threshold. The block
    * join keeps the pair space bounded; cosine is a fused zip_with +
    * aggregate in doubles.
    */
  def embeddingNearDupPairs(df: DataFrame, keyCol: String, vecCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    val l = df.select(col(blockCol).as("blk"), col(keyCol).as("a"), col(vecCol).as("va"))
    val r = df.select(col(blockCol).as("blk"), col(keyCol).as("b"), col(vecCol).as("vb"))
    l.join(r, Seq("blk")).where(col("a") < col("b"))
      .withColumn("cos", round(Similarity.cosine(col("va"), col("vb")), 6))
      .where(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }
}
