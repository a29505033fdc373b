package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, and document
  * fingerprinting. Scale design: all are shuffle-free projections, and
  * the per-word scan work (stopword/marker counting, rolling hash) runs
  * through the fused codegen'd [[WordStats]] expression — one split and
  * one md5 per word feeding every counter, inside whole-stage codegen.
  * The declarative higher-order-function forms are retained below as
  * `*Ref` differential oracles (HOFs are eval-only: one in a projection
  * drops the whole stage out of codegen and boxes every element — the
  * measured rule that motivated the kernel).
  *
  * Hash portability: [[portableHash]] derives a 60-bit integer from the
  * md5 hex digest, which any engine (including the DuckDB oracle) can
  * reproduce — used by the dedup family so signatures are verifiable
  * cross-engine.
  */
object TextOps {

  /** 60-bit deterministic hash of a string: first 15 hex chars of md5.
    * `conv` parses hex → decimal string → long (always < 2^60, so all
    * downstream affine transforms stay overflow-free in 64-bit).
    */
  def portableHash(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  val HashPrime = 1000000007L

  /** [[portableHash]] reduced mod a 30-bit prime — safe operand for
    * `(a*h+b) % p` MinHash transforms without 64-bit overflow.
    */
  def bucketHash(c: Column): Column = portableHash(c) % HashPrime

  /** Whitespace tokenization (single-space corpus convention). */
  def words(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(words(text)).cast("long")

  /** Corpus vocabulary statistics: per token, total occurrences
    * (`n_total`) and document frequency (`df`). Two-stage aggregation:
    * the first `groupBy(doc, token)` gets map-side partial combine, so
    * what crosses the first shuffle is one row per DISTINCT (doc, token)
    * pair — not one row per token instance (at 10^12 docs × 10³ tokens
    * that is the difference between a bounded shuffle and a 10^15-row
    * one). The second shuffle is vocabulary-sized. `df` falls out of the
    * second stage as a plain `count` (each group = one document), with
    * no `count(DISTINCT)` expansion anywhere.
    *
    * Heavy hitters = `.orderBy(desc("n_total"), asc("token")).limit(k)`
    * on the result — Catalyst plans that as TakeOrdered (per-partition
    * top-k, no global sort).
    */
  def vocabStats(df: DataFrame, keyCol: String, textCol: String): DataFrame =
    df.select(col(keyCol).as("_doc"), explode(words(col(textCol))).as("token"))
      .groupBy(col("_doc"), col("token")).agg(count(lit(1)).as("c"))
      .groupBy(col("token"))
      .agg(sum(col("c")).as("n_total"), count(lit(1)).as("df"))

  /** A small English stopword list shared with the oracle SQL. */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")

  // [[WordStats]] output layout
  private val WsWords = 0
  private val WsStop = 1
  private val WsHits0 = 2
  private def wsRolling: Int = WsHits0 + LangMarkers.length

  /** The fused [[WordStats]] kernel column: `[nWords, nStop,
    * markerHits(per language), rollingFp]` in one codegen'd pass.
    * Multi-statistic consumers should materialize this ONCE as its own
    * attribute (see [[qualityFeatures]]) so CollapseProject cannot
    * duplicate the scan per reference site.
    */
  def wordStats(text: Column): Column = {
    import org.apache.spark.sql.{GraftColumnBridge => EU}
    EU.column(WordStats(EU.expression(text), Stopwords, LangMarkers.map(_._2), HashPrime))
  }

  /** Quality features: word count, stopword ratio, average word length,
    * and a [0,1] quality score. Deterministic arithmetic over the fused
    * [[wordStats]] pass, projected as an attribute once — every derived
    * column reads counters from it (cheap array extracts), so the text
    * is split and hashed exactly once per row.
    * ≡ [[qualityFeaturesRef]], asserted by OpsSpec.
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val ws = col("_ws")
    val nWords = ws.getItem(WsWords)
    val nStop = ws.getItem(WsStop)
    val avgLen = (length(col(textCol)) - (nWords - 1)).cast("double") / nWords
    df.withColumn("_ws", wordStats(col(textCol)))
      .withColumn("n_words", nWords)
      .withColumn("stopword_ratio", round(nStop.cast("double") / nWords, 6))
      .withColumn("avg_word_len", round(avgLen, 6))
      .withColumn("quality",
        round(least(nStop.cast("double") / nWords * lit(2.0), lit(1.0)) * 0.5 +
          least(nWords.cast("double") / 100.0, lit(1.0)) * 0.5, 6))
      .drop("_ws")
  }

  /** Demo weight table for the learned quality gate: deterministic,
    * and every weight an exact binary fraction (multiples of 1/1024) so
    * feature SUMS are exact doubles — summation order cannot diverge the
    * Catalyst kernel, the HOF reference, and the DuckDB oracle. A
    * production pipeline loads trained weights instead; the engine
    * shape (plan-constant table + codegen'd kernel) is identical.
    */
  val ClassifierBuckets = 64
  val ClassifierWeights: Seq[Double] =
    (0 until ClassifierBuckets).map(j => (((j * 37) % 21) - 10) / 1024.0)
  val ClassifierBias: Double = -1.0 / 512

  /** Linear classifier logit over hashed word+bigram features — the
    * codegen'd [[TextClassifierLogit]] kernel with the plan-constant
    * weight table. ≡ [[classifierLogitRef]], asserted by OpsSpec.
    */
  def classifierLogit(text: Column,
      weights: Seq[Double] = ClassifierWeights,
      bias: Double = ClassifierBias): Column = {
    import org.apache.spark.sql.{GraftColumnBridge => EU}
    EU.column(TextClassifierLogit(EU.expression(text), weights, bias, HashPrime))
  }

  /** Sigmoid of [[classifierLogit]] — the [0,1] acceptance score a gate
    * thresholds on (monotone in the logit, so logit thresholds are
    * equivalent; cross-engine comparisons should use the logit — `exp`
    * may differ in the last ulp between engines).
    */
  def classifierScore(text: Column,
      weights: Seq[Double] = ClassifierWeights,
      bias: Double = ClassifierBias): Column =
    lit(1.0) / (lit(1.0) + exp(-classifierLogit(text, weights, bias)))

  /** HOF reference form of [[classifierLogit]] — differential oracle
    * (eval-only; never on a hot path).
    */
  def classifierLogitRef(text: Column,
      weights: Seq[Double] = ClassifierWeights,
      bias: Double = ClassifierBias): Column = {
    val k = weights.length
    val wArr = array(weights.map(lit): _*)
    val hs = transform(words(text), w => bucketHash(w))
    val uni = aggregate(hs, lit(0.0), (acc, h) =>
      acc + element_at(wArr, (h % k).cast("int") + 1))
    val bi = when(size(hs) >= 2,
      aggregate(sequence(lit(1), size(hs) - 1), lit(0.0), (acc, i) =>
        acc + element_at(wArr,
          ((element_at(hs, i) * 31L + element_at(hs, i + 1)) % HashPrime % k)
            .cast("int") + 1))).otherwise(lit(0.0))
    lit(bias) + (uni + bi) /
      greatest(size(hs).cast("double") * 2 - 1, lit(1.0))
  }

  /** HOF reference form of [[qualityFeatures]] — differential oracle. */
  def qualityFeaturesRef(df: DataFrame, textCol: String): DataFrame = {
    val w = words(col(textCol))
    val nWords = size(w).cast("long")
    val nStop = size(filter(w, x => x.isin(Stopwords: _*))).cast("long")
    val avgLen = (length(col(textCol)) - (size(w) - 1)).cast("double") / size(w)
    df.withColumn("n_words", nWords)
      .withColumn("stopword_ratio", round(nStop.cast("double") / nWords, 6))
      .withColumn("avg_word_len", round(avgLen, 6))
      .withColumn("quality",
        round(least(nStop.cast("double") / nWords * lit(2.0), lit(1.0)) * 0.5 +
          least(nWords.cast("double") / 100.0, lit(1.0)) * 0.5, 6))
  }

  /** Marker words per language for the n-gram/stopword language-ID
    * heuristic (shared with the oracle SQL).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "a", "is"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "est"))

  /** Heuristic language ID: count marker-word hits per language; argmax
    * with fixed priority order on ties; "und" (undetermined) when no
    * marker hits at all. Scores come from a [[wordStats]] column already
    * projected as an attribute (cheap array extracts — no re-scan).
    */
  def langIdFromStats(ws: Column): Column = {
    val scores = LangMarkers.zipWithIndex.map { case ((lang, _), i) =>
      lang -> ws.getItem(WsHits0 + i)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), els) =>
      when(s === best && s > 0, lit(lang)).otherwise(els)
    }
  }

  /** [[langIdFromStats]] over a single-use [[wordStats]] scan. */
  def langId(text: Column): Column = langIdFromStats(wordStats(text))

  /** HOF reference form of [[langId]] — differential oracle. */
  def langIdRef(text: Column): Column = {
    val w = words(text)
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(w, x => x.isin(markers: _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), els) =>
      when(s === best && s > 0, lit(lang)).otherwise(els)
    }
  }

  /** Normalized content fingerprint: md5 of lowercased, space-collapsed,
    * trimmed text — the exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), " +", " ").cast("binary"))

  /** Rolling polynomial hash over words (order-sensitive, unlike the
    * bag-of-words fingerprint): fold h = (h*31 + bucketHash(w)) mod p,
    * computed by the fused codegen'd [[WordStats]] kernel.
    * ≡ [[rollingFingerprintRef]], asserted by OpsSpec.
    */
  def rollingFingerprint(text: Column): Column =
    wordStats(text).getItem(wsRolling)

  /** HOF reference form of [[rollingFingerprint]] — differential oracle. */
  def rollingFingerprintRef(text: Column): Column =
    aggregate(words(text), lit(0L),
      (acc, x) => (acc * 31L + bucketHash(x)) % HashPrime)

  /** PII patterns, restricted to the RE2 ∩ java.util.regex common dialect
    * (no lookaround, no backreferences) so the same source text runs on
    * the engine and any RE2-based oracle: email, dotted-quad IPv4, and
    * NANP-style dashed phone numbers.
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"))

  /** PII detection + redaction: per row, one match count per pattern
    * (`n_email`, `n_ipv4`, `n_phone`) and the text with every match
    * replaced by its tag, applied in [[PiiPatterns]] order. Shuffle-free
    * projection of native `regexp_count` / `regexp_replace` expressions
    * (codegen'd, compiled Pattern cached per task) — the scan cost is
    * the regex automaton over the text, once per pattern.
    */
  def piiScan(df: DataFrame, textCol: String): DataFrame = {
    val counted = PiiPatterns.foldLeft(df) { case (d, (name, pat, _)) =>
      d.withColumn(s"n_$name", regexp_count(col(textCol), lit(pat)).cast("long"))
    }
    val redacted = PiiPatterns.foldLeft(col(textCol)) { case (c, (_, pat, tag)) =>
      regexp_replace(c, pat, tag)
    }
    counted.withColumn("redacted", redacted)
  }

  /** Intra-document repetition (the Gopher-style duplicate-n-gram rule):
    * `n_grams` = number of word-3-gram positions, `dup_ratio` = fraction
    * of positions occupied by an already-seen 3-gram
    * (1 − distinct/total; 0 for docs shorter than 3 words, whose single
    * whole-text shingle is trivially unique). Uses the codegen'd
    * [[Shingles3]] set for the distinct count — one split pass — plus
    * one `size(split)` for the position count; no shuffle.
    */
  def repetitionFeatures(df: DataFrame, keyCol: String, textCol: String): DataFrame =
    // _nw is materialized as its own (non-cheap, multi-referenced)
    // attribute so CollapseProject cannot inline one split() per
    // reference site
    df.select(col(keyCol),
        size(words(col(textCol))).as("_nw"),
        size(Dedup.shingles(col(textCol))).cast("long").as("_nd"))
      .select(col(keyCol),
        // null text → null n_grams (not the otherwise(1) arm), so null
        // docs null out consistently instead of reporting one gram
        when(col("_nw").isNull, lit(null))
          .when(col("_nw") >= 3, col("_nw") - 2).otherwise(lit(1))
          .cast("long").as("n_grams"),
        col("_nd"))
      .withColumn("dup_ratio",
        round(lit(1.0) - col("_nd").cast("double") / col("n_grams"), 6))
      .drop("_nd")
}
