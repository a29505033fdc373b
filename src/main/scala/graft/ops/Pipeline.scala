package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators that sit downstream of dedup/quality in a
  * training-data pipeline: canonical-document selection per duplicate
  * cluster, deterministic stratified sampling, and sequence packing
  * (concat-chunking) into fixed token budgets.
  *
  * All three are deterministic (hash- or order-based, no RNG state), so
  * results are reproducible across runs, partitionings, and engines —
  * the property the DuckDB oracles verify.
  */
object Pipeline {

  /** Pick one canonical document per duplicate cluster: the
    * highest-scoring member, ties broken by largest key IN THE KEY'S OWN
    * TYPE (struct max is field-by-field, so `max(struct(score, key))` is
    * the argmax with a deterministic tie-break — one hash aggregation
    * with map-side partial merge, no window sort). `canonical_id` keeps
    * the input key type; numeric keys tie-break numerically (10 > 9),
    * not lexicographically.
    *
    * `scored` is the corpus with a per-doc score column; `labels` is
    * [[Dedup.connectedComponents]] output (`id`, `cluster_id`). Docs
    * absent from `labels` are singletons: their cluster is their own
    * key (matching the min-label convention, where a cluster's id is
    * its smallest member key). The left join is shuffle-hash on the
    * corpus key; `labels` only holds docs that had a duplicate pair, so
    * it is orders of magnitude smaller than the corpus and
    * broadcast-able in the common case.
    */
  def canonicalPerCluster(scored: DataFrame, keyCol: String, scoreCol: String,
      labels: DataFrame): DataFrame =
    scored
      .join(labels.select(col("id").as("_lid"), col("cluster_id").as("_lcl")),
        col(keyCol) === col("_lid"), "left")
      .select(coalesce(col("_lcl"), col(keyCol)).as("cluster_id"),
        col(keyCol).as("_k"), col(scoreCol).cast("double").as("_s"))
      .groupBy(col("cluster_id"))
      .agg(max(struct(col("_s"), col("_k"))).as("_best"),
        count(lit(1L)).as("n_docs"))
      .select(col("cluster_id"),
        col("_best").getField("_k").as("canonical_id"),
        col("_best").getField("_s").as("best_score"),
        col("n_docs"))

  /** Granularity of sampling rates: 1e-6. */
  val SampleGranularity = 1000000L

  /** Deterministic per-stratum Bernoulli sample: keep a row iff
    * `portableHash(key) mod 1e6 < rate(stratum) * 1e6`. Membership
    * depends only on the key and the rate table — stable under
    * re-partitioning, re-runs, and engine changes, and monotone in the
    * rate (raising a stratum's rate only ADDS documents, so two samples
    * at r1 < r2 are nested — the property that makes ablation corpora
    * comparable). Pure scan-side filter: no shuffle, no RNG state, and
    * the md5-based hash keeps it reproducible by any engine.
    *
    * Strata with no entry in `rates` fall back to `defaultRate`.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0), "rates must be in [0,1]")
    require(defaultRate >= 0.0 && defaultRate <= 1.0, "defaultRate must be in [0,1]")
    val rate = coalesce(element_at(typedlit(rates), col(strataCol)), lit(defaultRate))
    val bucket = pmod(TextOps.portableHash(col(keyCol).cast("string")),
      lit(SampleGranularity))
    // round, don't truncate: 0.3 * 1e6 is 299999.9999… in binary — a
    // truncating cast would under-sample non-dyadic rates by one granule
    // and diverge from engines whose BIGINT cast rounds (DuckDB)
    df.where(bucket < round(rate * SampleGranularity).cast("long"))
  }

  /** Sequence packing (concat-chunking, the GPT-style pretraining
    * layout): within each (stratum, shard), order docs by key, take the
    * running token total, and cut a new bin every `budget` tokens —
    * `bin_id = floor(exclusive_cumsum / budget)`. A doc straddling a
    * boundary belongs to the bin it starts in (bins can overflow by
    * less than one doc; the trainer's concat+chunk absorbs it).
    *
    * The shard (`portableHash(key) mod nShards`) bounds every window
    * partition to ~1/nShards of a stratum, so a skewed stratum (src0
    * holds half the corpus in the test generator) never concentrates on
    * one task and the per-partition sort stays in memory — the window
    * is the op's one shuffle. Packing is deterministic per (stratum,
    * shard): adding shards re-buckets docs but never reorders a bin's
    * interior.
    */
  def packSequences(df: DataFrame, keyCol: String, tokCol: String,
      strataCol: String, budget: Long, nShards: Int = 64): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(nShards > 0, "nShards must be positive")
    val w = Window.partitionBy(col(strataCol), col("shard")).orderBy(col(keyCol))
    df.withColumn("shard",
        pmod(TextOps.portableHash(col(keyCol).cast("string")), lit(nShards.toLong)))
      .withColumn("_cum", sum(col(tokCol).cast("long")).over(w))
      .select(col(keyCol), col(strataCol), col("shard"),
        floor((col("_cum") - col(tokCol).cast("long")).cast("double") / budget)
          .cast("long").as("bin_id"))
  }

  /** Materialize a sample at rates that may EXCEED 1 (upsampling — the
    * output of [[mixtureWeights]] when a scarce domain's target share
    * needs repetition): every doc of a stratum with rate r appears
    * `floor(r)` times for sure, plus once more for the hash-gated
    * fraction `r - floor(r)` of docs — so the expected multiplicity is
    * exactly r, deterministically (same key ⇒ same epochs, every run,
    * any partitioning), and the fractional sample obeys the same
    * nesting property as [[stratifiedSample]]. Output = input columns +
    * `epoch` (1-based; a doc kept k times carries epochs 1..k, so
    * downstream packing can salt sequence order by epoch).
    *
    * Scan-side only: the epoch count is a per-row expression and the
    * repetition is one `explode` of a `sequence` — no shuffle, no join,
    * rows expand by at most `ceil(max rate)`.
    *
    * Null keys are EXCLUDED (same contract as [[stratifiedSample]],
    * where the null hash gate drops them): a null key has no stable
    * identity to gate on, so it gets no epochs — filtered explicitly
    * here so the engine and any SQL oracle agree by construction.
    */
  def epochSample(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Double]): DataFrame = {
    require(rates.values.forall(_ >= 0.0), "rates must be non-negative")
    val rate = coalesce(element_at(typedlit(rates), col(strataCol)), lit(0.0))
    val full = floor(rate).cast("long")
    val frac = rate - floor(rate)
    val bucket = pmod(TextOps.portableHash(col(keyCol).cast("string")),
      lit(SampleGranularity))
    val epochs = full +
      (bucket < round(frac * SampleGranularity).cast("long")).cast("long")
    // sequence(1, 0) would DESCEND ([1, 0]), so zero-epoch rows must map
    // to null, which explode drops — rate-0 strata and un-gated
    // fractional docs vanish without a separate filter
    df.where(col(keyCol).isNotNull)
      .withColumn("epoch",
        explode(when(epochs > 0L, sequence(lit(1L), epochs))))
  }

  /** Mixture weighting: turn target mixture shares into per-stratum
    * sampling rates. Given a global token `budget` and each stratum's
    * target share of it, the rate that hits the target is
    * `budget * share / available_tokens`, capped at `maxEpochs` (a rate
    * above 1.0 means the trainer repeats the stratum — upsampling; the
    * cap bounds repetition of scarce domains, the standard guard against
    * memorizing a small source). Output per stratum: available tokens,
    * target share, the capped `rate`, and the tokens the rate actually
    * yields (`expected_tokens = rate * available` — short of the target
    * exactly when the epoch cap binds).
    *
    * One hash aggregation over the corpus (map-side partial merge; the
    * result is one row per stratum, driver-small). Rates ≤ 1 feed
    * [[stratifiedSample]] directly; rates above 1 split into one full
    * epoch plus a fractional sample of the remainder. Strata absent
    * from `shares` get share 0 → rate 0 (excluded from the mixture).
    *
    * Output rows exist only for strata PRESENT in the corpus: a `shares`
    * key that matches no rows (a typo, or an empty source) produces no
    * row here, and its slice of the budget silently goes unspent —
    * callers turning the output into policy should check coverage, as
    * [[graft.AssemblyPipeline]] does with a require on the rate map.
    */
  def mixtureWeights(df: DataFrame, strataCol: String, tokCol: String,
      shares: Map[String, Double], budget: Long,
      maxEpochs: Double = 4.0): DataFrame = {
    require(shares.values.forall(s => s >= 0.0), "shares must be non-negative")
    require(budget > 0, "budget must be positive")
    require(maxEpochs > 0, "maxEpochs must be positive")
    val share = coalesce(element_at(typedlit(shares), col(strataCol)), lit(0.0))
    df.groupBy(col(strataCol))
      .agg(sum(col(tokCol).cast("long")).as("available_tokens"))
      .select(col(strataCol), col("available_tokens"),
        share.as("target_share"),
        // a stratum with no countable tokens (all-null or zero) must get
        // rate 0, not maxEpochs — both Spark and DuckDB skip nulls in
        // least(), and x/0.0 is Inf, so an unguarded least() would
        // CLAMP both degenerate cases to the cap
        when(col("available_tokens").isNull || col("available_tokens") === 0L,
            lit(0.0))
          .otherwise(least(lit(maxEpochs),
            lit(budget.toDouble) * share / col("available_tokens").cast("double")))
          .as("rate"))
      .withColumn("expected_tokens",
        round(col("rate") *
          coalesce(col("available_tokens"), lit(0L)).cast("double")).cast("long"))
  }

  /** Deterministic per-group cap ("domain balancing" — e.g. at most N
    * documents per registrable domain, the standard web-corpus guard
    * against one boilerplate-heavy site dominating the mixture): keeps
    * the `maxPerGroup` rows of each group with the smallest
    * `portableHash(key) >> 7` (ties by key asc) — a hash-uniform,
    * reproducible subsample of every group. The `>> 7` keeps the
    * priority under 2^53, so the aggregator's Double score is EXACT and
    * engine/oracle selection orders are identical bit-for-bit.
    *
    * Scale rationale: selection is a bounded top-k AGGREGATION
    * ([[Similarity.TopKByScore]] — map-side partials hold ≤ maxPerGroup
    * candidates per (task, group)), never `row_number` over a per-group
    * window: a 10^8-doc hot domain costs its share of the scan plus
    * ≤ cap·tasks shuffle rows, not one single-task sort. The kept-key
    * frame (≤ |groups|·cap rows) joins back LEFT SEMI on the unique
    * `keyCol`; AQE broadcasts it when it fits.
    */
  def capPerGroup(df: DataFrame, keyCol: String, groupCol: String,
      maxPerGroup: Int): DataFrame = {
    require(maxPerGroup > 0, "maxPerGroup must be positive")
    val topk = Similarity.topKAggFor(df.schema(keyCol).dataType, maxPerGroup)
    val pri = -shiftright(
      TextOps.portableHash(col(keyCol).cast("string")), 7).cast("double")
    val kept = df
      .select(col(groupCol).as("_g"), col(keyCol).as("_k"), pri.as("_s"))
      .groupBy(col("_g"))
      .agg(topk(col("_k"), col("_s")).as("_top"))
      .select(explode(col("_top.key")).as("_kk"))
    df.join(kept, col(keyCol) === col("_kk"), "left_semi")
  }

  /** Deterministic disjoint multi-way split (train/val/test):
    * `splits` = ordered (label, fraction) with fractions in [0,1]
    * summing to ≤ 1. Each row's granule
    * `portableHash(key) mod 1e6` falls into exactly one contiguous
    * cumulative range, so the labels PARTITION the keyspace — no row in
    * two splits, ever, under any re-run, repartitioning, or engine
    * (the property train/test hygiene actually requires; sampling each
    * split independently would leak). Rows past the last cumulative cut
    * (fractions summing below 1) get a NULL label = unassigned.
    * Scan-only: no shuffle, no RNG state; same granule space and
    * rounding as [[stratifiedSample]], so a split can be composed with
    * nested-sample ablations.
    */
  def assignSplit(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "splits must be non-empty")
    require(splits.forall(_._2 >= 0.0), "split fractions must be non-negative")
    require(splits.map(_._2).sum <= 1.0 + 1e-9, "split fractions must sum to <= 1")
    val bucket = pmod(TextOps.portableHash(col(keyCol).cast("string")),
      lit(SampleGranularity))
    val cuts = splitCuts(splits)
    val labeled = splits.zip(cuts).foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), cut)) =>
        coalesce(acc, when(bucket < cut, lit(name)))
    }
    df.withColumn("split", labeled)
  }

  /** Cumulative granule cuts for [[assignSplit]] — shared with oracle
    * SQL renderings so both engines round identically (round, not
    * truncate: same rationale as [[stratifiedSample]]).
    */
  def splitCuts(splits: Seq[(String, Double)]): Seq[Long] =
    splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(f => math.round(f * SampleGranularity))
}
