package graft

import graft.engine.ValidationEngine
import graft.ops.{Dedup, Pipeline, TextOps}
import graft.spec.SchemaParser
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The integration shape a corpus user actually runs — one end-to-end
  * assembly pass: validate → exact dedup → near-dup pairs → clusters →
  * canonical selection → decontaminate → stratified sample → pack.
  * Every stage records its row count, and the cross-stage invariants
  * (partitions of the input, keep+drop conservation, cluster coverage)
  * are ASSERTED, not just printed — a pipeline that silently loses or
  * duplicates docs between stages is wrong even when each operator is
  * individually correct.
  *
  * `run` is the library-shaped composition (used by PipelineSpec
  * end-to-end at small scale); `main` drives it over the deterministic
  * 1M-doc SoakBench corpus and prints one JSON line per stage.
  */
object AssemblyPipeline {

  final case class StageCounts(
      nInput: Long, nValid: Long,
      nExactDropped: Long, nAfterExact: Long,
      nPairs: Long, nLabeled: Long, nCanonical: Long, nAfterNear: Long,
      nQualityDropped: Long, nAfterQuality: Long,
      nBench: Long, nContaminated: Long, nAfterDecon: Long,
      nSampled: Long, nPacked: Long, nBins: Long)

  // doc_id is a union type: the synthetic corpora carry "d<N>" strings,
  // real documents tables (e.g. the testdata parquet) carry integers —
  // the assembly contract only needs presence and non-null, not a shape
  private val specJson =
    """{
      "type": "object",
      "properties": {
        "doc_id": {"type": ["string", "integer"], "required": true},
        "text":   {"type": "string", "required": true, "minLength": 1},
        "source": {"type": "string", "required": true}
      }
    }"""
  private lazy val spec = SchemaParser.parse(specJson)

  /** Materialize a stage boundary. Each assembly stage's plan embeds the
    * previous stage on BOTH sides of a join (survivor semi/anti joins), so
    * composing seven stages lazily grows the logical plan multiplicatively
    * — Catalyst analysis alone becomes the bottleneck long before any task
    * runs. A production run writes parquet between stages;
    * `localCheckpoint` is the in-memory analog: compute once, truncate
    * lineage, later stages plan against a leaf.
    */
  private def stage(df: DataFrame): DataFrame = df.localCheckpoint(eager = true)

  /** One assembly pass over `docs` (doc_id, text, source). `benchPred`
    * marks the held-out eval slice used for decontamination;
    * `contaminationThreshold` drops corpus docs whose shingle overlap
    * fraction with the eval slice reaches it.
    */
  def run(spark: SparkSession, docs: DataFrame,
      benchPred: org.apache.spark.sql.Column,
      contaminationThreshold: Double = 0.5,
      sampleRates: Map[String, Double] = Map("src0" -> 0.5),
      defaultRate: Double = 0.25,
      packBudget: Long = 2048L,
      mixShares: Option[Map[String, Double]] = None,
      mixTokenBudget: Long = 0L,
      minQuality: Double = 0.0,
      maxRepetition: Double = 1.0,
      maxDupSpanFraction: Double = 1.0,
      mixMaxEpochs: Double = 1.0,
      outDir: Option[String] = None): StageCounts = {
    val nInput = docs.count()

    // 1) validate; only passing rows continue (violations go to the
    //    checkpointed violations sink in the production run — here the
    //    count is the invariant)
    val annotated = ValidationEngine.annotate(docs, spec)
    val valid = stage(annotated.where(col(ValidationEngine.PassCol))
      .select(docs.columns.map(col): _*))
    val nValid = valid.count()

    // 2) exact dedup: remove every non-survivor of an exact group
    val dropList = Dedup.exactDuplicates(valid, "doc_id", "text")
      .select(col("doc_id"))
    val nExactDropped = dropList.count()
    val afterExact = stage(valid.join(dropList, Seq("doc_id"), "left_anti"))
    val nAfterExact = afterExact.count()
    require(nAfterExact == nValid - nExactDropped,
      s"exact dedup must conserve rows: $nValid - $nExactDropped != $nAfterExact")

    // 3) near-dup: LSH pairs → connected components → canonical per
    //    cluster (quality argmax); keep canonical docs only
    val pairs = stage(Dedup.minhashCandidatePairs(
      Dedup.minhashSignature(afterExact, "doc_id", "text"), "doc_id"))
    val nPairs = pairs.count()
    val labels = Dedup.connectedComponents(pairs, "a", "b")
    val nLabeled = labels.count()
    val scored = TextOps.qualityFeatures(afterExact, "text")
      .select(col("doc_id"), col("quality"))
    val canonical = stage(
      Pipeline.canonicalPerCluster(scored, "doc_id", "quality", labels))
    val nCanonical = canonical.count()
    require(canonical.agg(sum("n_docs")).collect()(0).getLong(0) == nAfterExact,
      "every post-exact doc must be counted in exactly one cluster")
    val afterNear = stage(afterExact.join(
      canonical.select(col("canonical_id").as("doc_id")), Seq("doc_id"), "left_semi"))
    val nAfterNear = afterNear.count()
    require(nAfterNear == nCanonical,
      s"one survivor per cluster: $nAfterNear != $nCanonical")

    // 3.5) quality gate (Gopher-style filtering after dedup): drop
    //    survivors below the quality floor, above the intra-doc
    //    repetition ceiling, or above the CROSS-corpus duplicated-span
    //    ceiling (partial copies near-dedup's whole-doc similarity
    //    misses — a C4-style filter: BOTH members of a partial-copy
    //    pair drop, this is filtering, not survivor selection). The
    //    quality/repetition scores are shuffle-free scan passes; the
    //    span fraction adds the rolling-gram shuffle only when its
    //    threshold is active. No-op thresholds skip everything.
    // each lane runs only when its own threshold can drop anything —
    // a vacuous predicate (quality < 0.0, dup_ratio > 1.0) would still
    // cost a full-corpus scan pass just to select zero rows
    val gateLanes = Seq(
      Option.when(minQuality > 0.0)(
        TextOps.qualityFeatures(afterNear, "text")
          .where(col("quality") < minQuality).select("doc_id")),
      Option.when(maxRepetition < 1.0)(
        TextOps.repetitionFeatures(afterNear, "doc_id", "text")
          .where(col("dup_ratio") > maxRepetition).select("doc_id")),
      Option.when(maxDupSpanFraction < 1.0)(
        Dedup.duplicateSpanFraction(afterNear, "doc_id", "text")
          .where(col("dup_word_ratio") > maxDupSpanFraction)
          .select("doc_id"))
    ).flatten
    val (nQualityDropped, afterQuality) =
      if (gateLanes.isEmpty) (0L, afterNear)
      else {
        val drops = stage(gateLanes.reduce(_ union _).distinct())
        (drops.count(), stage(afterNear.join(drops, Seq("doc_id"), "left_anti")))
      }
    val nAfterQuality = afterQuality.count()
    require(nAfterQuality == nAfterNear - nQualityDropped,
      s"quality gate must conserve rows: $nAfterNear - $nQualityDropped != $nAfterQuality")

    // 4) decontamination: the held-out eval slice leaves the corpus, and
    //    corpus docs sharing >= threshold of their shingles with it drop
    val bench = afterQuality.where(benchPred)
    val nBench = bench.count()
    val corpus = afterQuality.where(!benchPred)
    val contaminated = Dedup.contaminationScores(
        corpus, "doc_id", "text", bench, "text")
      .where(col("contamination") >= contaminationThreshold)
      .select(col("id").as("doc_id"))
    val nContaminated = contaminated.count()
    val afterDecon = stage(corpus.join(contaminated, Seq("doc_id"), "left_anti"))
    val nAfterDecon = afterDecon.count()
    require(nAfterDecon == nAfterQuality - nBench - nContaminated,
      "decon must conserve rows: corpus minus eval slice minus contaminated")

    // 5) deterministic sample. With `mixShares` set, the rates are not
    //    caller constants but COMPUTED from the post-decon corpus by
    //    mixture weighting (target share of `mixTokenBudget` per
    //    source) — the production flow, where the mixture spec is
    //    policy and the rates follow the data. `mixMaxEpochs` ≤ 1 caps
    //    rates at one epoch (a Bernoulli sample cannot repeat docs);
    //    above 1 the epoch sampler below materializes the repetition.
    val withTok0 =
      if (mixShares.isDefined)
        stage(afterDecon.withColumn("n_tok", TextOps.tokenCount(col("text"))))
      else afterDecon
    val rates = mixShares match {
      case Some(shares) =>
        require(mixTokenBudget > 0, "mixShares needs a positive mixTokenBudget")
        val computed = Pipeline.mixtureWeights(withTok0, "source", "n_tok",
            shares, mixTokenBudget, maxEpochs = mixMaxEpochs)
          .select(col("source"), col("rate")).collect()
          .map(r => r.getString(0) -> r.getDouble(1)).toMap
        // a share key with no corpus rows yields no rate row, and its
        // budget slice would silently go unspent — a policy typo, not a
        // sampling decision, so fail loudly
        val missing = shares.keySet -- computed.keySet
        require(missing.isEmpty,
          s"mixShares name strata absent from the corpus: ${missing.mkString(", ")}")
        computed
      case None => sampleRates
    }
    // with mixMaxEpochs > 1 the computed rates may EXCEED 1 — scarce
    // strata repeat (upsampling): epochSample materializes floor(rate)
    // full epochs plus a hash-gated fractional one, and the pack key
    // becomes (doc_id, epoch) so repeated docs pack as distinct
    // sequences; otherwise a plain Bernoulli stratified sample
    val upsampling = mixShares.isDefined && mixMaxEpochs > 1.0
    val (sampled, packKey) =
      if (upsampling)
        (Pipeline.epochSample(withTok0, "doc_id", "source", rates)
          .withColumn("samp_key",
            concat(col("doc_id").cast("string"), lit(":"), col("epoch"))),
          "samp_key")
      else
        (Pipeline.stratifiedSample(withTok0, "doc_id", "source",
          rates, if (mixShares.isDefined) 0.0 else defaultRate), "doc_id")
    val nSampled = sampled.count()

    // 6) sequence packing over the sample
    val withTok =
      if (mixShares.isDefined) sampled
      else sampled.withColumn("n_tok", TextOps.tokenCount(col("text")))
    val packed = Pipeline.packSequences(withTok, packKey, "n_tok", "source",
      budget = packBudget, nShards = 8)
    val nPacked = packed.count()
    require(nPacked == nSampled, "packing assigns every sampled doc to a bin")
    val nBins = packed.select("source", "shard", "bin_id").distinct().count()

    // materialize the assembled corpus: doc rows with their pack
    // assignment, partitioned by stratum (the layout a trainer's data
    // loader reads bin-by-bin within a source)
    outDir.foreach { d =>
      withTok.join(packed.select(packKey, "shard", "bin_id"), Seq(packKey))
        .write.mode("overwrite").partitionBy("source").parquet(d)
    }

    StageCounts(nInput, nValid, nExactDropped, nAfterExact,
      nPairs, nLabeled, nCanonical, nAfterNear,
      nQualityDropped, nAfterQuality,
      nBench, nContaminated, nAfterDecon, nSampled, nPacked, nBins)
  }

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_ASSEMBLY_ROWS", "1000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-assembly")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.parquet.enableNestedColumnVectorizedReader", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic corpus with arithmetic dup lanes (SoakBench) plus a
    // 10-stratum source column and a JUNK lane for the quality gate:
    // every id ≡ 3 (mod 4001) gets its own word repeated 24 times —
    // unique text (so no dedup lane touches it), dup-3-gram ratio
    // 21/22 ≈ 0.955, dropped exactly by the repetition ceiling
    val junkMod = 4001L
    val data = s"/tmp/graft_assembly_corpus2_$rows"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(data))) {
      val num = substring(col("doc_id"), 2, 100).cast("long")
      SoakBench.corpus(spark, rows, poolSize = 65521)
        .withColumn("source", concat(lit("src"), pmod(num, lit(10))))
        .withColumn("text",
          when(pmod(num, lit(junkMod)) === 3,
            array_join(array_repeat(concat(lit("j"), num), 24), " "))
          .otherwise(col("text")))
        .write.mode("overwrite").parquet(data)
    }
    val docs = spark.read.parquet(data)

    val idNum = pmod(substring(col("doc_id"), 2, 100).cast("long"), lit(1009))
    val t0 = System.nanoTime()
    val c = run(spark, docs, benchPred = idNum === 5, maxRepetition = 0.5)
    val sec = (System.nanoTime() - t0) / 1e9

    // arithmetic expectations of the generator (loose bands — the exact
    // interplay of the dup lanes is what the per-op soaks pin down)
    require(c.nValid == c.nInput, "generator emits only valid docs")
    require(c.nExactDropped >= rows / 16 - rows / 1000 &&
      c.nExactDropped <= rows / 16 + rows / 10007 + rows / 1000,
      s"exact-dup lane is ~rows/16: ${c.nExactDropped}")
    require(c.nPairs >= rows / 16 - rows / 500, s"near-dup lane is ~rows/16: ${c.nPairs}")
    // junk-lane arithmetic is EXACT: unique texts survive both dedups,
    // so the gate sees (and drops) every id ≡ 3 (mod junkMod)
    val junkCount = if (rows > 3) (rows - 4) / junkMod + 1 else 0L
    require(c.nQualityDropped == junkCount,
      s"quality gate must drop exactly the junk lane: ${c.nQualityDropped} != $junkCount")
    println(f"""{"metric":"assembly_total","value":$sec%.1f,"unit":"sec","rows":$rows,"cpus":$cpus}""")
    report(c)
    spark.stop()
  }

  /** One JSON line per stage (shared by `main` and `Main assemble`). */
  def report(c: StageCounts): Unit = {
    println(s"""{"stage":"validate","in":${c.nInput},"valid":${c.nValid}}""")
    println(s"""{"stage":"exact_dedup","dropped":${c.nExactDropped},"kept":${c.nAfterExact}}""")
    println(s"""{"stage":"near_dedup","pairs":${c.nPairs},"labeled":${c.nLabeled},"clusters+singletons":${c.nCanonical},"kept":${c.nAfterNear}}""")
    println(s"""{"stage":"quality_gate","dropped":${c.nQualityDropped},"kept":${c.nAfterQuality}}""")
    println(s"""{"stage":"decontaminate","eval_slice":${c.nBench},"contaminated":${c.nContaminated},"kept":${c.nAfterDecon}}""")
    println(s"""{"stage":"sample","kept":${c.nSampled}}""")
    println(s"""{"stage":"pack","docs":${c.nPacked},"bins":${c.nBins}}""")
  }
}
