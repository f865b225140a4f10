package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for training-data curation (BASELINE north
  * star): quality stats, language-ID heuristic, token counting,
  * fingerprinting. All map-only projections — embarrassingly parallel,
  * no shuffle, fully codegen'd (built-in + higher-order functions, no
  * UDFs). */
object TextOps {

  private[ext] val stopwords = Seq("the", "a", "of", "and", "to")

  /** Per-document quality stats: token count (whitespace), BPE-ish
    * subword count (greedy 1-3 letter regex chunks), char length, avg
    * token length, stopword ratio. All oracle-expressible. */
  def qTextStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val t = split(col("text"), " ")
    docs.select(
      col("doc_id"),
      size(t).as("n_tokens"),
      length(col("text")).as("n_chars_obs"),
      regexp_count(col("text"), lit("[a-z]{1,3}")).as("n_bpeish"),
      (aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") /
        size(t)).as("avg_token_len"),
      (size(filter(t, x => x.isInCollection(stopwords))).cast("double") /
        size(t)).as("stopword_ratio"))
  }

  val qTextStatsSql: String =
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_tokens,
      |  length(text) AS n_chars_obs,
      |  len(regexp_extract_all(text, '[a-z]{1,3}')) AS n_bpeish,
      |  CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x)))
      |       AS DOUBLE) / len(string_split(text, ' ')) AS avg_token_len,
      |  CAST(len(list_filter(string_split(text, ' '),
      |                       x -> x IN ('the', 'a', 'of', 'and', 'to')))
      |       AS DOUBLE) / len(string_split(text, ' ')) AS stopword_ratio
      |FROM documents""".stripMargin

  /** Language-ID heuristic (n-gram/stopword profile). The synthetic
    * corpus shares one vocabulary across langs, so the prediction is
    * uniform — the operator shape (profile ratio → threshold CASE) is
    * what's under test, and it is deterministic and oracle-checked. */
  def qLangId(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val t = split(col("text"), " ")
    val enRatio = size(filter(t, x => x.isInCollection(stopwords)))
      .cast("double") / size(t)
    docs.select(
      col("doc_id"), col("lang").as("lang_declared"),
      enRatio.as("en_marker_ratio"),
      when(enRatio >= 0.02, lit("en")).otherwise(lit("und")).as("lang_predicted"))
  }

  val qLangIdSql: String =
    """SELECT doc_id, lang AS lang_declared,
      |  CAST(len(list_filter(string_split(text, ' '),
      |                       x -> x IN ('the', 'a', 'of', 'and', 'to')))
      |       AS DOUBLE) / len(string_split(text, ' ')) AS en_marker_ratio,
      |  CASE WHEN CAST(len(list_filter(string_split(text, ' '),
      |                                 x -> x IN ('the', 'a', 'of', 'and', 'to')))
      |            AS DOUBLE) / len(string_split(text, ' ')) >= 0.02
      |       THEN 'en' ELSE 'und' END AS lang_predicted
      |FROM documents""".stripMargin

  /** Document fingerprinting: md5 over whitespace-normalized lowercase
    * text — the canonical content-address for exact dedup across
    * storage systems. */
  def qFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val normalized = regexp_replace(lower(col("text")), "\\s+", " ")
    docs.select(col("doc_id"), md5(normalized.cast("binary")).as("fp"))
  }

  val qFingerprintSql: String =
    """SELECT doc_id,
      |  md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
      |FROM documents""".stripMargin

  /** Edit-distance verification over the exact-dedup groups: for every
    * prefix-collision group, the Levenshtein distance between the
    * representative and each other member — the character-level
    * confirmation pass a dedup pipeline runs on its cheapest candidate
    * source. O(len²) per PAIR, but pairs = docs in multi-member groups
    * only; the quadratic unit cost never touches the corpus. */
  def qEditDistance(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"),
        substring(col("text"), 1, 40).as("pk"))
    val rep = docs.groupBy("pk").agg(min(col("doc_id")).as("rep_id"))
    docs.join(rep, "pk")
      .filter(col("doc_id") =!= col("rep_id"))
      .join(Tables(spark, dir, "documents")
        .select(col("doc_id").as("rep_id"), col("text").as("rep_text")),
        "rep_id")
      .select(col("rep_id"), col("doc_id"),
        levenshtein(col("text"), col("rep_text")).as("edit_dist"))
  }

  val qEditDistanceSql: String =
    """WITH keyed AS (
      |  SELECT doc_id, text, substr(text, 1, 40) AS pk FROM documents
      |), rep AS (
      |  SELECT pk, MIN(doc_id) AS rep_id FROM keyed GROUP BY pk
      |)
      |SELECT r.rep_id, k.doc_id,
      |  levenshtein(k.text, rd.text) AS edit_dist
      |FROM keyed k
      |JOIN rep r ON k.pk = r.pk AND k.doc_id <> r.rep_id
      |JOIN documents rd ON rd.doc_id = r.rep_id""".stripMargin

  /** Deterministic hash sampling — the reproducible train/test split
    * every training pipeline needs: keep a row iff the first hex digit
    * of md5(doc_id) falls in a fixed bucket set (here 2/16 = 12.5%).
    * Unlike TABLESAMPLE/rand(), the split is a pure function of the
    * key: stable across runs, engines, partitionings, and cluster
    * sizes, and any worker can answer "which split is this row in?"
    * without coordination. Map-only, scale-free. */
  def qHashSample(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .filter(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1)
        .isin("0", "1"))
      .select(col("doc_id"), col("lang"), col("source"))

  val qHashSampleSql: String =
    """SELECT doc_id, lang, source FROM documents
      |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')""".stripMargin

  /** Rolling-hash document fingerprinting (winnowing / MOSS): rolling
    * polynomial hash over char 8-grams, sliding-window minima, distinct
    * set per doc — the position-robust fingerprint (vs [[qFingerprint]]'s
    * whole-document md5, which any edit changes entirely). Computed by
    * the native [[org.apache.spark.sql.graftshim.WinnowFingerprints]]
    * expression (O(len) per doc, map-only, no shuffle before the
    * explode); the oracle replays the identical integer arithmetic in
    * SQL. */
  def qWinnow(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        explode(org.apache.spark.sql.graftshim.WinnowFingerprints
          .winnowFingerprints(col("text"))).as("fp"))

  val qWinnowSql: String = {
    import org.apache.spark.sql.graftshim.WinnowFingerprints.{B, K, M, W}
    def lowcp(j: Int): String =
      s"(CASE WHEN ascii(substr(text, i+$j, 1)) BETWEEN 65 AND 90 " +
        s"THEN ascii(substr(text, i+$j, 1)) + 32 " +
        s"ELSE ascii(substr(text, i+$j, 1)) END)"
    val horner = (1 until K).foldLeft(s"(${lowcp(0)} % $M)") {
      (acc, j) => s"(($acc * $B + ${lowcp(j)}) % $M)"
    }
    s"""WITH pos AS (
      |  SELECT doc_id, i, $horner AS h
      |  FROM documents,
      |       LATERAL unnest(generate_series(1, length(text) - ${K - 1}))
      |         AS u(i)
      |), win AS (
      |  SELECT doc_id, MIN(h) OVER (
      |    PARTITION BY doc_id ORDER BY i
      |    ROWS BETWEEN CURRENT ROW AND ${W - 1} FOLLOWING) AS fp
      |  FROM pos
      |)
      |SELECT DISTINCT doc_id, fp FROM win""".stripMargin
  }

  /** Quality filter — the actual curation operator: score each document
    * on length / punctuation ratio / stopword ratio and keep only docs
    * passing all gates (thresholds sized to this corpus: length ≥ 100
    * chars, stopword ratio ≥ 0.01 drops the bottom ~15%; punct ≤ 0.3
    * guards against symbol soup). Map-only scoring + filter: the
    * dropped rows never reach the shuffle — at 100 TB the filter runs
    * at scan speed and the pipeline behind it sees only survivors. */
  def qQualityFilter(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val t = split(col("text"), " ")
    val scored = docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars_obs"),
      (regexp_count(col("text"), lit("[.,;:!?]")).cast("double") /
        greatest(length(col("text")), lit(1))).as("punct_ratio"),
      (size(filter(t, x => x.isInCollection(stopwords))).cast("double") /
        size(t)).as("stopword_ratio"))
    scored.filter(col("n_chars_obs") >= 100 &&
      col("punct_ratio") <= 0.3 && col("stopword_ratio") >= 0.01)
  }

  val qQualityFilterSql: String =
    """WITH scored AS (
      |  SELECT doc_id,
      |    length(text) AS n_chars_obs,
      |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
      |      / greatest(length(text), 1) AS punct_ratio,
      |    CAST(len(list_filter(string_split(text, ' '),
      |                         x -> x IN ('the', 'a', 'of', 'and', 'to')))
      |      AS DOUBLE) / len(string_split(text, ' ')) AS stopword_ratio
      |  FROM documents)
      |SELECT * FROM scored
      |WHERE n_chars_obs >= 100 AND punct_ratio <= 0.3
      |  AND stopword_ratio >= 0.01""".stripMargin

  /** PII patterns shared by engine and oracle. Restricted to the regex
    * subset Java regex and RE2 (DuckDB) agree on — character classes,
    * bounded repetition, no lookaround/backreferences — so redaction is
    * bit-identical across engines. */
  val piiEmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val piiPhoneRe = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"

  /** PII scrubbing — the redaction stage every training-data pipeline
    * runs before text leaves curation: replace email-like and
    * phone-like spans with placeholder tokens and count what was
    * redacted (the counts feed compliance reporting). Redaction is
    * sequential (emails first), so the phone COUNT runs on the
    * email-redacted text — a phone-shaped span swallowed by an email
    * match (e.g. `555-123-4567@host`) is counted once as an email, and
    * each count equals the number of placeholders of its kind in the
    * output. Map-only codegen'd regex passes, no shuffle — runs at scan
    * speed at any corpus size. The synthetic corpus plants no PII, so
    * counts are zero here; FunctionsSpec proves the redaction semantics
    * on handcrafted strings, the oracle proves engine parity over the
    * corpus. */
  def qPiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val emailScrubbed = regexp_replace(col("text"), piiEmailRe, "<EMAIL>")
    Tables(spark, dir, "documents").select(
      col("doc_id"),
      regexp_replace(emailScrubbed, piiPhoneRe, "<PHONE>").as("scrubbed"),
      regexp_count(col("text"), lit(piiEmailRe)).cast("bigint").as("n_emails"),
      regexp_count(emailScrubbed, lit(piiPhoneRe)).cast("bigint")
        .as("n_phones"))
  }

  val qPiiScrubSql: String =
    s"""SELECT doc_id,
      |  regexp_replace(regexp_replace(text,
      |    '$piiEmailRe', '<EMAIL>', 'g'),
      |    '$piiPhoneRe', '<PHONE>', 'g') AS scrubbed,
      |  CAST(len(regexp_extract_all(text, '$piiEmailRe')) AS BIGINT)
      |    AS n_emails,
      |  CAST(len(regexp_extract_all(
      |    regexp_replace(text, '$piiEmailRe', '<EMAIL>', 'g'),
      |    '$piiPhoneRe')) AS BIGINT) AS n_phones
      |FROM documents""".stripMargin

  /** Chunk window / stride in tokens: 32-token chunks every 24 tokens
    * (8-token overlap so no boundary context is lost) — the corpus runs
    * 10–99 tokens/doc, so documents split into 1–5 chunks. */
  val chunkWindow = 32
  val chunkStride = 24

  /** Document chunking — the stage that turns curated documents into
    * training-context-sized pieces: overlapping token windows of
    * [[chunkWindow]] tokens every [[chunkStride]], keyed
    * (doc_id, chunk_id) with the token count per chunk. A chunk starts
    * at every stride offset below the document length, so the final
    * chunk may be short (it is never empty, and every token is covered
    * by at least one chunk). Map-only: sequence + slice build the
    * chunk list in-expression and the explode is the only row
    * amplification — no shuffle at any corpus size. */
  /** The chunk grid over any (doc_id, text-like) frame — the ONE
    * definition of chunking, shared by [[qChunk]] (raw text),
    * [[curateChunks]] (scrubbed text), and the specs; its SQL twin is
    * [[chunkSelectSql]]. */
  def chunkTokens(df: DataFrame, textCol: Column): DataFrame = {
    val t = split(textCol, " ")
    val lastChunk = floor((size(t) - lit(1)).cast("double") / chunkStride)
      .cast("bigint")
    df.select(col("doc_id"), t.as("t"),
        explode(sequence(lit(0L), lastChunk)).as("chunk_id"))
      .select(
        col("doc_id"), col("chunk_id"),
        concat_ws(" ", slice(col("t"),
          (col("chunk_id") * chunkStride + 1).cast("int"),
          lit(chunkWindow))).as("chunk_text"),
        size(slice(col("t"),
          (col("chunk_id") * chunkStride + 1).cast("int"),
          lit(chunkWindow))).cast("bigint").as("n_chunk_tokens"))
  }

  def qChunk(spark: SparkSession, dir: String): DataFrame =
    chunkTokens(Tables(spark, dir, "documents"), col("text"))

  /** SQL twin of [[chunkTokens]], parameterized by source relation and
    * text column so the standalone and composed oracles stay one
    * definition. */
  def chunkSelectSql(relation: String, textCol: String): String =
    s"""SELECT doc_id, i AS chunk_id,
      |  array_to_string(t[i*$chunkStride+1 : i*$chunkStride+$chunkWindow],
      |    ' ') AS chunk_text,
      |  CAST(len(t[i*$chunkStride+1 : i*$chunkStride+$chunkWindow])
      |    AS BIGINT) AS n_chunk_tokens
      |FROM (SELECT doc_id, string_split($textCol, ' ') AS t
      |      FROM $relation) AS toks,
      |     LATERAL unnest(generate_series(0, (len(t)-1)//$chunkStride))
      |       AS u(i)""".stripMargin

  val qChunkSql: String = chunkSelectSql("documents", "text")

  /** Deterministic STRATIFIED sampling — the mixture-shaping partner of
    * the hash split and the group cap: each stratum (here: language)
    * keeps its own fraction of documents, selected by the same md5
    * doc-id coin as [[qHashSample]] / [[groupCap]] — reproducible
    * across runs, engines, and partitionings, never `rand()` or
    * `df.sample` (both partition-layout-dependent). Down-weights the
    * dominant stratum (en → 35%) while keeping the tail at 70% — the
    * standard rebalancing move before training-mix assembly. Map-only
    * predicate: runs at scan speed at any corpus size, and composes
    * with [[groupCap]] (hard cap) when a stratum needs an absolute
    * ceiling rather than a fraction. */
  def qStratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"))
    val coinFrac = conv(substring(
        md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("double") / 4294967296.0
    val keepFrac = when(col("lang") === "en", 0.35).otherwise(0.70)
    docs.filter(coinFrac < keepFrac)
  }

  val qStratifiedSampleSql: String =
    """SELECT doc_id, lang, source FROM documents
      |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |        AS UBIGINT) / 4294967296.0
      |      < CASE WHEN lang = 'en' THEN 0.35 ELSE 0.70 END""".stripMargin

  /** Token budget for [[qMixtureSample]], as a fraction of the corpus's
    * total tokens. 0.4 keeps every per-source fraction well inside
    * (0, 1) for this corpus's near-uniform source shares (head ≈ 0.8,
    * tail ≈ 0.3) — the `least(1.0, …)` guard still handles a source so
    * small its target weight can't be met. */
  val mixtureBudgetShare = 0.4

  /** MIXTURE PLAN — the observability half of [[qMixtureSample]]: the
    * per-domain PLANNING table a data lead signs off on before the mix
    * is assembled. For each source: available tokens, target weight
    * (basis points — the same 0.10/0.0375 table as the sampler, held
    * exactly as 1000/375 bp so every derived number is integer
    * arithmetic), target tokens under the [[mixtureBudgetShare]]
    * budget, required epochs in permille (>1000 ⇒ the domain must
    * REPEAT to meet its weight — the oversampling alarm), and the
    * deficit in tokens. All integer div — hash-exact across engines.
    * Plan shape: one partial-agg scan to per-source totals (#domains
    * rows), one driver scalar; nothing corpus-sized shuffles. */
  def qMixturePlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, dir, "documents")
      .select(col("source"),
        size(split(col("text"), " ")).cast("bigint").as("n_tokens"))
    // ONE corpus scan: the #domains-row per-source totals come to the
    // driver once, and the grand total, budget and every derived column
    // are plain Scala over those rows — materializing the result never
    // re-runs the tokenization (the qScoreThreshold lesson: a second
    // action over a lazy corpus-wide frame is a second full map pass)
    val perSource = docs.groupBy("source")
      .agg(sum(col("n_tokens")).as("src_tokens"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val total = perSource.map(_._2).sum
    val budget = total * 2 / 5 // mixtureBudgetShare = 0.4 exactly
    val head = Set("src0", "src1", "src2", "src3")
    perSource.toSeq.map { case (source, srcTokens) =>
      val bp = if (head(source)) 1000L else 375L
      val target = budget * bp / 10000
      (source, srcTokens, bp, target, target * 1000 / srcTokens,
        math.max(0L, target - srcTokens))
    }.toDF("source", "src_tokens", "weight_bp", "target_tokens",
      "epochs_permille", "deficit_tokens")
  }

  val qMixturePlanSql: String =
    """WITH toks AS (
      |  SELECT source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |per_source AS (
      |  SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens
      |  FROM toks GROUP BY source),
      |tot AS (SELECT CAST(SUM(src_tokens) AS BIGINT) AS t FROM per_source)
      |SELECT source, src_tokens,
      |  CAST(CASE WHEN source IN ('src0', 'src1', 'src2', 'src3')
      |    THEN 1000 ELSE 375 END AS BIGINT) AS weight_bp,
      |  CAST(((t * 2 // 5) * (CASE WHEN source IN
      |      ('src0', 'src1', 'src2', 'src3') THEN 1000 ELSE 375 END))
      |    // 10000 AS BIGINT) AS target_tokens,
      |  CAST((((t * 2 // 5) * (CASE WHEN source IN
      |      ('src0', 'src1', 'src2', 'src3') THEN 1000 ELSE 375 END))
      |    // 10000) * 1000 // src_tokens AS BIGINT) AS epochs_permille,
      |  CAST(GREATEST(0, ((t * 2 // 5) * (CASE WHEN source IN
      |      ('src0', 'src1', 'src2', 'src3') THEN 1000 ELSE 375 END))
      |    // 10000 - src_tokens) AS BIGINT) AS deficit_tokens
      |FROM per_source, tot""".stripMargin

  /** DOMAIN-MIXTURE sampling to a token budget — the DoReMi-style
    * static reweighting step that assembles a training mix: given a
    * target token-share weight per source domain (here: 0.10 for the
    * four head sources, 0.0375 for the sixteen tail sources — sums to
    * 1), down-sample each domain so its sampled tokens ≈ its share of
    * a [[mixtureBudgetShare]]·total token budget.
    *
    * Two aggregates over (source, n_tokens) — per-domain and grand
    * totals, both tiny (#domains rows) and broadcast back — then the
    * same map-only md5 doc-id coin as [[qStratifiedSample]] against the
    * derived per-domain fraction f = least(1, w·(share·T)/T_s).
    * Deterministic across engines/partitionings: T and T_s are exact
    * longs, f's float ops are mirrored 1:1 in the oracle (IEEE ops are
    * exactly rounded, so identical op order ⇒ identical bits), and the
    * coin is the usual exact dyadic fraction. At 100 TB the totals pass
    * is a map-side-combined scan and the filter runs at scan speed;
    * nothing corpus-sized shuffles. */
  def qMixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("bigint").as("n_tokens"))
    val perSource = docs.groupBy("source")
      .agg(sum(col("n_tokens")).as("src_tokens"))
    val total = perSource.agg(sum(col("src_tokens"))).head().getLong(0)
    val w = when(col("source").isin("src0", "src1", "src2", "src3"), 0.10)
      .otherwise(0.0375)
    val frac = least(lit(1.0),
      w * (lit(mixtureBudgetShare) * lit(total.toDouble)) /
        col("src_tokens").cast("double"))
    val coinFrac = conv(substring(
        md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("double") / 4294967296.0
    docs.join(broadcast(perSource), "source")
      .filter(coinFrac < frac)
      .select(col("doc_id"), col("source"), col("n_tokens"))
  }

  val qMixtureSampleSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |per_source AS (
      |  SELECT source, SUM(n_tokens) AS src_tokens FROM toks GROUP BY source),
      |total AS (SELECT SUM(src_tokens) AS t FROM per_source)
      |SELECT doc_id, toks.source, n_tokens
      |FROM toks JOIN per_source ON toks.source = per_source.source, total
      |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |        AS UBIGINT) / 4294967296.0
      |  < LEAST(1.0,
      |      CASE WHEN toks.source IN ('src0', 'src1', 'src2', 'src3')
      |           THEN 0.10 ELSE 0.0375 END
      |        * ($mixtureBudgetShare * CAST(t AS DOUBLE))
      |        / CAST(src_tokens AS DOUBLE))""".stripMargin

  /** TEMPERATURE-BASED source resampling — the multilingual α-sampling
    * move (mBERT/XLM-R's exponentiated-share mixing, T = 1/α = 2
    * here): after sampling, each source's expected token mass is
    * ∝ T_s^α — the head is flattened and the tail lifted without the
    * explicit per-source weight table [[qMixtureSample]] needs.
    *
    * Formulated to be HASH-PORTABLE: the keep fraction is
    * f_s = min(1, √(T_max / T_s)) — expected kept tokens
    * T_s·√(T_max/T_s) = √(T_max)·√T_s ∝ T_s^(1/2) — which needs ONLY
    * division and square root of exact integer totals, both
    * correctly-rounded IEEE operations, identical bits in any engine.
    * The textbook normalization (T_s^α / Σ T_s^α) would put a FLOAT
    * SUM over sources in the denominator, whose value depends on
    * aggregation order — exactly the nondeterminism every float path
    * in this engine avoids. Same bounded aggregates + md5 doc coin as
    * the mixture sampler; map-only at any corpus size. [[tempSample]]
    * generalizes to any α via pow (same sampling quality; pow is not
    * correctly rounded, so cross-engine hash equality is guaranteed
    * only for the dyadic exponents like 1/2 — stated trade). */
  /** Uniform budget scale for [[qTempSample]] — this corpus's source
    * shares are near-uniform, so the unclamped fractions would all hit
    * the min(1, ·) ceiling and the sampler would keep everything; a
    * uniform c < 1 preserves the ∝ T_s^α proportionality (it scales
    * every source identically) while making the sampler actually
    * sample. Production sets c to its token budget. */
  val tempBudgetScale = 0.5

  def qTempSample(spark: SparkSession, dir: String): DataFrame =
    tempSample(Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("bigint").as("n_tokens")),
      scale = tempBudgetScale)

  /** Generic form over (doc_id, source, n_tokens); α = 0.5 keeps the
    * correctly-rounded sqrt path, other α route through pow. */
  def tempSample(docs: DataFrame, alpha: Double = 0.5,
                 scale: Double = 1.0): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val perSource = docs.groupBy("source")
      .agg(sum(col("n_tokens")).as("src_tokens"))
    val tMax = perSource.agg(max(col("src_tokens"))).head().getLong(0)
    val ratio = lit(tMax.toDouble) / col("src_tokens").cast("double")
    val frac = least(lit(1.0),
      lit(scale) *
        (if (alpha == 0.5) sqrt(ratio) else pow(ratio, 1.0 - alpha)))
    val coinFrac = conv(substring(
        md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("double") / 4294967296.0
    docs.join(broadcast(perSource), "source")
      .filter(coinFrac < frac)
      .select(col("doc_id"), col("source"), col("n_tokens"))
  }

  val qTempSampleSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |per_source AS (
      |  SELECT source, SUM(n_tokens) AS src_tokens FROM toks GROUP BY source),
      |mx AS (SELECT MAX(src_tokens) AS m FROM per_source)
      |SELECT doc_id, toks.source, n_tokens
      |FROM toks JOIN per_source ON toks.source = per_source.source, mx
      |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |        AS UBIGINT) / 4294967296.0
      |  < LEAST(1.0, $tempBudgetScale
      |      * sqrt(CAST(m AS DOUBLE) / CAST(src_tokens AS DOUBLE)))""".stripMargin

  /** DATASET CARD — the one-row summary a corpus release publishes
    * (the "data card" every serious dataset ships): volume (docs,
    * whitespace tokens, mean doc length), diversity (distinct sources,
    * languages, texts — the exact-dup rate falls out of
    * n_docs − n_distinct_texts), quality (documents passing the
    * len/punct/stopword gate — the same predicate [[qQualityFilter]]
    * and the classifier distillation use), and PII exposure (total
    * email/phone matches, the counts [[qPiiScrub]] redacts). ONE
    * partial-agg scan over the corpus — every aggregate here is
    * map-side combinable except the three exact distincts, which are
    * the q_count_distinct posture (swap in the KMV/HLL sketches at
    * 100 TB if exactness isn't required). All-integer except the one
    * mirrored IEEE division. */
  /** PER-SOURCE data cards with DRIFT columns — [[qDatasetCard]] broken
    * out by source, each row carrying its quality-pass and duplication
    * rates in exact permille PLUS the corpus-wide rates, so a source
    * whose quality or dedup profile drifts from the corpus reads
    * directly off its row (the per-ingest review table: "src7's pass
    * rate is 340‰ against a 780‰ corpus — quarantine the drop").
    * Integer permille throughout — hash-exact. Plan: ONE corpus scan
    * (grouping sets would also work; a |sources|-row agg plus a 1-row
    * rollup derived from it on the driver is simpler and equal), no
    * second tokenization: the corpus totals sum the per-source rows. */
  def qSourceCards(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = split(col("text"), " ")
    val gate = length(col("text")) >= 100 &&
      (regexp_count(col("text"), lit("[.,;:!?]")).cast("double") /
        greatest(length(col("text")), lit(1))) <= 0.3 &&
      (size(filter(t, x => x.isInCollection(
        Seq("the", "a", "of", "and", "to")))).cast("double") /
        size(t)) >= 0.01
    val rows = Tables(spark, dir, "documents")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(t).cast("bigint")).as("n_tokens"),
        count_distinct(col("text")).as("n_distinct_texts"),
        sum(gate.cast("bigint")).as("quality_pass"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    val (nDocs, qPass, nDistinct) =
      (rows.map(_._2).sum, rows.map(_._5).sum, rows.map(_._4).sum)
    rows.toSeq.map { case (src, n, tok, dis, qp) =>
      (src, n, tok, qp * 1000 / n, dis * 1000 / n,
        qPass * 1000 / nDocs, nDistinct * 1000 / nDocs)
    }.toDF("source", "n_docs", "n_tokens", "quality_permille",
      "distinct_permille", "corpus_quality_permille",
      "corpus_distinct_permille")
  }

  val qSourceCardsSql: String =
    """WITH per AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
      |    CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct_texts,
      |    CAST(SUM(CASE WHEN length(text) >= 100
      |      AND CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
      |          / greatest(length(text), 1) <= 0.3
      |      AND CAST(len(list_filter(string_split(text, ' '),
      |            x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
      |          / len(string_split(text, ' ')) >= 0.01
      |      THEN 1 ELSE 0 END) AS BIGINT) AS quality_pass
      |  FROM documents GROUP BY source),
      |tot AS (
      |  SELECT CAST(SUM(n_docs) AS BIGINT) AS n,
      |    CAST(SUM(quality_pass) AS BIGINT) AS qp,
      |    CAST(SUM(n_distinct_texts) AS BIGINT) AS dis
      |  FROM per)
      |SELECT source, n_docs, n_tokens,
      |  CAST(quality_pass * 1000 // n_docs AS BIGINT) AS quality_permille,
      |  CAST(n_distinct_texts * 1000 // n_docs AS BIGINT)
      |    AS distinct_permille,
      |  CAST(qp * 1000 // n AS BIGINT) AS corpus_quality_permille,
      |  CAST(dis * 1000 // n AS BIGINT) AS corpus_distinct_permille
      |FROM per, tot""".stripMargin

  def qDatasetCard(spark: SparkSession, dir: String): DataFrame = {
    val t = split(col("text"), " ")
    val gate = length(col("text")) >= 100 &&
      (regexp_count(col("text"), lit("[.,;:!?]")).cast("double") /
        greatest(length(col("text")), lit(1))) <= 0.3 &&
      (size(filter(t, x => x.isInCollection(
        Seq("the", "a", "of", "and", "to")))).cast("double") /
        size(t)) >= 0.01
    Tables(spark, dir, "documents").agg(
        count(lit(1)).as("n_docs"),
        sum(size(t).cast("bigint")).as("n_tokens"),
        count_distinct(col("source")).as("n_sources"),
        count_distinct(col("lang")).as("n_langs"),
        count_distinct(col("text")).as("n_distinct_texts"),
        sum(gate.cast("bigint")).as("quality_pass"),
        sum(regexp_count(col("text"), lit(piiEmailRe)).cast("bigint"))
          .as("pii_emails"),
        sum(regexp_count(regexp_replace(col("text"), piiEmailRe, "<EMAIL>"),
          lit(piiPhoneRe)).cast("bigint")).as("pii_phones"))
      .select(col("n_docs"), col("n_tokens"), col("n_sources"),
        col("n_langs"), col("n_distinct_texts"), col("quality_pass"),
        col("pii_emails"), col("pii_phones"),
        (col("n_tokens").cast("double") / col("n_docs"))
          .as("mean_doc_tokens"))
  }

  val qDatasetCardSql: String =
    s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
      |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
      |  CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct_texts,
      |  CAST(SUM(CASE WHEN length(text) >= 100
      |    AND CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
      |        / greatest(length(text), 1) <= 0.3
      |    AND CAST(len(list_filter(string_split(text, ' '),
      |          x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
      |        / len(string_split(text, ' ')) >= 0.01
      |    THEN 1 ELSE 0 END) AS BIGINT) AS quality_pass,
      |  CAST(SUM(len(regexp_extract_all(text, '$piiEmailRe')) ) AS BIGINT)
      |    AS pii_emails,
      |  CAST(SUM(len(regexp_extract_all(
      |    regexp_replace(text, '$piiEmailRe', '<EMAIL>', 'g'),
      |    '$piiPhoneRe'))) AS BIGINT) AS pii_phones,
      |  CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*)
      |    AS mean_doc_tokens
      |FROM documents""".stripMargin

  /** Shard count for [[qShardShuffle]] — in production this is the
    * writer parallelism of the shuffled-corpus export. */
  val shuffleShards = 8

  /** Deterministic GLOBAL SHUFFLE + sharding — the final step before a
    * training run reads the corpus: a reproducible random permutation
    * of the documents (order by the md5 doc-id coin — never `rand()`,
    * which is partition-layout-dependent) with each doc's global
    * position and a round-robin shard assignment (position mod
    * [[shuffleShards]]), so shard files are exactly balanced and
    * interleaving shards 0..N-1 replays the full shuffled order.
    *
    * The global position is the scale problem (`ROW_NUMBER() OVER
    * (ORDER BY …)` plans a single-partition window); this routes
    * through [[graft.operators.RowNumbering]] — range-partitioned sort
    * + per-partition counts + Tungsten offset append — same as the
    * transactions view and [[qPack]]. The md5 tiebreak is doc_id,
    * making the sort key a total order (same contract as PrefixSum). */
  def qShardShuffle(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents").select(col("doc_id"))
      .withColumn("skey",
        md5(col("doc_id").cast("string").cast("binary")))
    graft.operators.RowNumbering
      .withGlobalRowNumber(docs, Seq(col("skey"), col("doc_id")), "rn")
      .select(col("doc_id"), (col("rn") - 1).as("pos"),
        pmod(col("rn") - 1, lit(shuffleShards.toLong)).as("shard"))
  }

  val qShardShuffleSql: String =
    s"""SELECT doc_id,
      |  ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
      |    - 1 AS pos,
      |  (ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
      |    - 1) % $shuffleShards AS shard
      |FROM documents""".stripMargin

  /** Pack context size in tokens for [[qPack]]. */
  val packContext = 64

  /** Sequence packing — the stage after chunking in a training-data
    * pipeline: concatenate all chunks in a deterministic global order
    * (doc_id, chunk_id) and split the token stream into
    * [[packContext]]-token training sequences; each chunk is assigned
    * the pack holding its STARTING token offset (GPT-style
    * concat-and-split; a chunk may straddle its pack's end — packing
    * layout, not chunk truncation).
    *
    * The global running token total is the scale problem here: `SUM OVER
    * (ORDER BY …)` plans a single-partition window. This runs through
    * [[graft.operators.PrefixSum]] instead — range-sort + per-partition
    * sums + offset map, the RowNumbering shape generalized — and the
    * driver hash-checks it against DuckDB's genuine window, which is
    * precisely the single-partition-tolerant formulation the operator
    * replaces. Integer arithmetic end to end (long token counts,
    * integer division) → bit-identical across engines. */
  def qPack(spark: SparkSession, dir: String): DataFrame = {
    val chunks = qChunk(spark, dir)
      .select(col("doc_id"), col("chunk_id"), col("n_chunk_tokens"))
    val withCum = graft.operators.PrefixSum.withRunningTotal(
      chunks, Seq(col("doc_id"), col("chunk_id")),
      "n_chunk_tokens", "cum_tokens")
    withCum.select(
      col("doc_id"), col("chunk_id"), col("n_chunk_tokens"),
      col("cum_tokens"),
      expr(s"(cum_tokens - n_chunk_tokens) div $packContext")
        .as("pack_id"))
  }

  /** SQL twin of the PrefixSum + pack-assignment step: appended after a
    * `chunks` CTE; `extra` carries additional chunk columns through
    * (", chunk_text" in the composed pipeline). One definition shared
    * by [[qPackSql]] and [[qCurateSql]]. */
  def packAfterChunksSql(extra: String = ""): String =
    s"""cum AS (
      |  SELECT doc_id, chunk_id$extra, n_chunk_tokens,
      |    CAST(SUM(n_chunk_tokens) OVER (
      |      ORDER BY doc_id, chunk_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_tokens
      |  FROM chunks)
      |SELECT doc_id, chunk_id$extra, n_chunk_tokens, cum_tokens,
      |  CAST((cum_tokens - n_chunk_tokens) // $packContext AS BIGINT)
      |    AS pack_id
      |FROM cum""".stripMargin

  val qPackSql: String =
    s"""WITH chunks AS (
      |${qChunkSql.linesIterator.map("  " + _).mkString("\n")}
      |),
      |${packAfterChunksSql()}""".stripMargin

  /** PACKING-EFFICIENCY statistics — the ops metric a training run
    * watches next to the pack itself: per pack, how many chunks were
    * assigned, how many tokens they carry, and how far the last one
    * SPILLS past the pack boundary (concat-and-split assigns a chunk
    * to the pack holding its starting offset, so spill is layout debt
    * the trainer's attention mask pays for). One partial-agg groupBy
    * over [[qPack]]'s output; all-integer, hash-checked. */
  def qPackStats(spark: SparkSession, dir: String): DataFrame =
    qPack(spark, dir)
      .groupBy("pack_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_chunk_tokens")).cast("bigint").as("n_tokens"),
        max(col("cum_tokens")).as("mx"))
      .select(col("pack_id"), col("n_chunks"), col("n_tokens"),
        greatest(col("mx") - (col("pack_id") + 1) * packContext, lit(0L))
          .cast("bigint").as("spill_out"))

  val qPackStatsSql: String =
    s"""WITH packed AS (
      |${qPackSql.linesIterator.map("  " + _).mkString("\n")}
      |)
      |SELECT pack_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
      |  CAST(SUM(n_chunk_tokens) AS BIGINT) AS n_tokens,
      |  CAST(GREATEST(MAX(cum_tokens) - (pack_id + 1) * $packContext, 0)
      |    AS BIGINT) AS spill_out
      |FROM packed GROUP BY pack_id""".stripMargin

  /** Per-pack SAMPLE BOUNDARIES — the metadata a trainer needs to mask
    * attention across packed documents: for each pack, the ordered
    * list of (doc_id, chunk_id, start_off) with the chunk's starting
    * token offset WITHIN the pack. Derived purely from [[qPack]]'s
    * assignment (start_off = (cum − n) mod context); the per-pack list
    * is array_sort over collect_list — per-GROUP work bounded by
    * context/min-chunk, never a window, and deterministic because the
    * (doc_id, chunk_id) order is total. */
  def qPackBoundaries(spark: SparkSession, dir: String): DataFrame =
    qPack(spark, dir)
      .select(col("pack_id"),
        struct(col("doc_id"), col("chunk_id"),
          ((col("cum_tokens") - col("n_chunk_tokens")) %
            packContext).as("start_off")).as("b"))
      .groupBy("pack_id")
      .agg(count(lit(1)).as("n_samples"),
        array_join(transform(array_sort(collect_list(col("b"))),
            x => concat_ws(":", x.getField("doc_id"),
              x.getField("chunk_id"), x.getField("start_off"))),
          ";").as("boundaries"))

  val qPackBoundariesSql: String =
    s"""WITH packed AS (
      |${qPackSql.linesIterator.map("  " + _).mkString("\n")}
      |)
      |SELECT pack_id, CAST(COUNT(*) AS BIGINT) AS n_samples,
      |  string_agg(
      |    doc_id || ':' || chunk_id || ':' ||
      |      ((cum_tokens - n_chunk_tokens) % $packContext),
      |    ';' ORDER BY doc_id, chunk_id) AS boundaries
      |FROM packed GROUP BY pack_id""".stripMargin

  /** Corpus MANIFEST — the dataset-versioning artifact: one row with
    * the doc/token totals and a two-level Merkle digest of the corpus
    * content. Each doc contributes md5(text); docs hash-partition into
    * [[manifestBuckets]] buckets whose digests are md5 over their
    * members' digests in doc_id order; the root is md5 over bucket
    * digests in bucket order. Two reasons this shape survives 100 TB:
    * per-bucket concatenation is GROUPED (shuffle carries 32-hex
    * digests, not text), and the root folds [[manifestBuckets]] small
    * strings on one row. Any engine replays it — the driver
    * hash-checks the root — and two corpora are byte-identical iff
    * their roots match (mod md5 collisions). */
  val manifestBuckets = 64

  def qManifest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    // sign-preserving % (not pmod) so the Spark, DuckDB and spec-replay
    // formulations agree on bucket membership for ANY doc_id domain —
    // a negative id would bucket differently under pmod vs SQL's %
    val perDoc = docs.select(col("doc_id"),
      (col("doc_id") % manifestBuckets.toLong).as("bkt"),
      md5(col("text").cast("binary")).as("dh"),
      size(split(col("text"), " ")).cast("bigint").as("n_toks"))
    val buckets = perDoc.groupBy("bkt")
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"),
        md5(array_join(transform(
            array_sort(collect_list(struct(col("doc_id"), col("dh")))),
            x => x.getField("dh")), "").cast("binary")).as("bh"))
    buckets
      .select(col("n_docs"), col("n_tokens"),
        struct(col("bkt"), col("bh")).as("b"))
      .agg(sum("n_docs").cast("bigint").as("n_docs"),
        sum("n_tokens").cast("bigint").as("n_tokens"),
        md5(array_join(transform(array_sort(collect_list(col("b"))),
          x => x.getField("bh")), "").cast("binary")).as("corpus_md5"))
  }

  val qManifestSql: String =
    s"""WITH per_doc AS (
      |  SELECT doc_id, doc_id % $manifestBuckets AS bkt,
      |    md5(text) AS dh,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
      |  FROM documents),
      |buckets AS (
      |  SELECT bkt, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
      |    md5(string_agg(dh, '' ORDER BY doc_id)) AS bh
      |  FROM per_doc GROUP BY bkt)
      |SELECT CAST(SUM(n_docs) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
      |  md5(string_agg(bh, '' ORDER BY bkt)) AS corpus_md5
      |FROM buckets""".stripMargin

  /** SNAPSHOT DIFF — corpus versioning's workhorse: classify every
    * document across two snapshots as added / removed / changed /
    * unchanged by content fingerprint. The operator behind "what moved
    * between yesterday's crawl and today's?" and the audit trail a
    * reproducible-training-set policy needs. Generic over any two
    * frames sharing an id + content column.
    *
    * Scale shape: ONE full-outer shuffle join keyed on the id — both
    * sides co-partition, fingerprints are 32-byte md5 strings computed
    * map-side (text never crosses the shuffle), output is
    * corpus-sized but each row is (id, 9-char status). At 100 TB, run
    * the [[qManifest]] Merkle compare FIRST: identical roots skip the
    * diff outright, and per-bucket root comparison narrows the join to
    * the buckets that actually changed (the manifest's bucket ids are
    * `doc_id % manifestBuckets` — a deterministic partition of any
    * future snapshot too). */
  def snapshotDiff(a: DataFrame, b: DataFrame,
                   idCol: String = "doc_id",
                   contentCol: String = "text"): DataFrame = {
    val fa = a.select(col(idCol), md5(col(contentCol).cast("binary")).as("fa"))
    val fb = b.select(col(idCol), md5(col(contentCol).cast("binary")).as("fb"))
    fa.join(fb, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("fa").isNull, lit("added"))
          .when(col("fb").isNull, lit("removed"))
          .when(col("fa") =!= col("fb"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Driver query: two deterministic snapshot VIEWS of the documents
    * table (A drops every 3rd doc and truncates every 5th's text —
    * yesterday's smaller, older-extraction crawl; B drops every 4th —
    * today's), diffed. Derivation-from-one-table is the q_bloom_novel
    * posture: the OPERATOR is generic, the snapshots just need to be
    * reproducible in the oracle. All four statuses occur at every SF
    * by construction (ids ≡ 0 mod 12 exist → added; mod patterns
    * guarantee the rest). */
  def qSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val snapA = docs.filter(col("doc_id") % 3 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, substring(col("text"), 1, 50))
          .otherwise(col("text")).as("text"))
    val snapB = docs.filter(col("doc_id") % 4 =!= 0)
    snapshotDiff(snapA, snapB)
  }

  val qSnapshotDiffSql: String =
    """WITH a AS (
      |  SELECT doc_id,
      |    md5(CASE WHEN doc_id % 5 = 0 THEN substr(text, 1, 50)
      |        ELSE text END) AS fa
      |  FROM documents WHERE doc_id % 3 <> 0),
      |b AS (
      |  SELECT doc_id, md5(text) AS fb
      |  FROM documents WHERE doc_id % 4 <> 0)
      |SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
      |  CASE WHEN a.doc_id IS NULL THEN 'added'
      |       WHEN b.doc_id IS NULL THEN 'removed'
      |       WHEN a.fa <> b.fb THEN 'changed'
      |       ELSE 'unchanged' END AS status
      |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id""".stripMargin

  /** The last meter of the pipeline: write packed sequences as training
    * SHARD files. `repartitionByRange(pack_id)` gives each shard a
    * contiguous pack range (a pack's chunks never straddle shard
    * files — the property a sequential trainer needs), and the
    * within-shard sort puts chunks in stream order. One range exchange,
    * then parallel writes; shard count = write parallelism, sized to
    * the trainer's reader fleet, independent of corpus layout. */
  def writeTrainingShards(packed: DataFrame, path: String,
                          shards: Int): Unit =
    packed
      .repartitionByRange(shards, col("pack_id"))
      .sortWithinPartitions(col("pack_id"), col("doc_id"), col("chunk_id"))
      .write.mode("overwrite").parquet(path)

  /** Passage length (tokens) for [[qPassageDedup]] — non-overlapping,
    * unlike the chunking stride, so a passage duplicated across
    * documents is counted once per occurrence, never against itself. */
  val passageLen = 24

  /** Passage-level exact dedup — sub-document deduplication: the corpus
    * repeats PASSAGES (boilerplate headers, license blocks, quoted
    * replies) far more often than whole documents, and document-level
    * dedup never sees them. Segment every document into non-overlapping
    * [[passageLen]]-token passages, hash each (md5 — portable), and
    * report every hash occurring more than once with its occurrence and
    * document counts.
    *
    * Scale shape: segmentation is map-only (sequence + slice
    * in-expression, explode the only amplification); the groupBy
    * shuffles (hash, doc_id) pairs — 32 hex chars + a long, never
    * passage text; output is bounded by the duplicated subset. The md5
    * is the portability choice (same bytes in any engine), mirroring
    * the hash-sample/group-cap coin. */
  def qPassageDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val t = split(col("text"), " ")
    val lastP = floor((size(t) - lit(1)).cast("double") / passageLen)
      .cast("bigint")
    val passages = docs
      .select(col("doc_id"), t.as("t"),
        explode(sequence(lit(0L), lastP)).as("p"))
      .select(col("doc_id"),
        md5(concat_ws(" ", slice(col("t"),
          (col("p") * passageLen + 1).cast("int"),
          lit(passageLen))).cast("binary")).as("ph"))
    passages.groupBy("ph")
      .agg(count(lit(1)).as("n_occurrences"),
        count_distinct(col("doc_id")).as("n_docs"))
      .filter(col("n_occurrences") > 1)
  }

  val qPassageDedupSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |),
      |p AS (
      |  SELECT doc_id,
      |    md5(array_to_string(
      |      t[i*$passageLen+1 : i*$passageLen+$passageLen], ' ')) AS ph
      |  FROM toks,
      |       LATERAL unnest(generate_series(0, (len(t)-1)//$passageLen))
      |         AS u(i))
      |SELECT ph, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
      |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      |FROM p GROUP BY ph HAVING COUNT(*) > 1""".stripMargin

  /** Window length (tokens) for [[qSubstrDedup]] — OVERLAPPING stride-1
    * windows, unlike [[passageLen]]'s fixed grid: any duplicated token
    * run of ≥ substrK tokens is caught regardless of alignment. */
  val substrK = 8

  /** EXACT-SUBSTRING DEDUP (Lee et al. 2022's ExactSubstr, the
    * suffix-array half of "Deduplicating Training Data Makes Language
    * Models Better") — the dedup granularity between
    * [[qPassageDedup]]'s aligned passages and the near-dup families:
    * find every token span duplicated ANYWHERE in the corpus (across
    * documents or within one — self-repetition counts, as in the
    * paper) and rewrite each document with its duplicated spans
    * removed, reporting the per-doc damage.
    *
    * Formulation (the distributed stand-in for a suffix array, which
    * does not shard): hash every stride-1 window of [[substrK]] tokens
    * (md5 — portable bytes); a window hash occurring more than once
    * marks its k token positions as duplicated; a document's clean
    * text is its uncovered tokens in order. COVERAGE GUARANTEE: a
    * maximal duplicated run of L ≥ k tokens contains L−k+1 duplicated
    * windows and is covered END TO END — equivalent to ExactSubstr
    * for runs ≥ k, blind to shorter ones (the recall dial is k). Like
    * the paper's operator, ALL copies of a duplicated span are
    * removed, not all-but-one — the span's every occurrence sits in a
    * duplicated window, and span-level canonical election is exactly
    * the problem suffix arrays don't shard; run this AFTER document
    * dedup (the e2e order), where surviving cross-doc duplicated
    * spans are boilerplate you want gone from every survivor anyway.
    *
    * Scale shape: windowing is map-only (explode is the n-rows-per-doc
    * amplification every token-level operator pays); the hash groupBy
    * shuffles (32-hex, doc_id, pos) rows once — the honest
    * corpus-tokens-sized exchange this operator is known for (ExactSubstr
    * pipelines dedicate a run to it at 100 TB); the duplicated side is
    * bounded by duplicated mass × k; the rebuild is a per-doc
    * aggregation (array_sort over kept (pos, token) structs — never a
    * collect, never order-dependent). Everything is md5/integer/string
    * arithmetic: the full output, REWRITTEN TEXT INCLUDED, is
    * hash-checked against [[qSubstrDedupSql]]. */
  def qSubstrDedup(spark: SparkSession, dir: String): DataFrame =
    substrDedup(Tables(spark, dir, "documents"))

  /** The generic form over any (doc_id, text) frame — `k` is the
    * recall dial (runs shorter than k are invisible). */
  def substrDedup(docs: DataFrame, k: Int = substrK): DataFrame =
    substrCleanWith(docs,
      windowHashes(docs, k).groupBy("wh").agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).select("wh"),
      k)

  /** (doc_id, p, wh) for every stride-1 k-token window — the shared
    * map-only stage of the batch operator and the streaming stats
    * store ([[graft.streaming.CurationStream.mergeWindowStatsBatch]]). */
  private[graft] def windowHashes(docs: DataFrame, k: Int): DataFrame = {
    val t = split(col("text"), " ")
    docs.select(col("doc_id"), t.as("t"), size(t).as("n"))
      .filter(col("n") >= k)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(1), col("n") - (k - 1))).as("p"))
      .select(col("doc_id"), col("p"),
        md5(concat_ws(" ", slice(col("t"), col("p"), lit(k)))
          .cast("binary")).as("wh"))
  }

  /** Rewrite `docs` against a GIVEN duplicated-window-hash set — the
    * lazy-view half shared by [[substrDedup]] (dup set mined from the
    * same corpus) and the streaming clean view (dup set from the
    * incremental stats store): coverage explode bounded by dup mass ×
    * k, per-doc array_sort rebuild, never a collect. */
  private[graft] def substrCleanWith(docs: DataFrame, dup: DataFrame,
                                     k: Int): DataFrame = {
    val t = split(col("text"), " ")
    val toks = docs.select(col("doc_id"), t.as("t"), size(t).as("n"))
    val covered = windowHashes(docs, k).join(dup, "wh")
      .select(col("doc_id"),
        explode(sequence(col("p"), col("p") + (k - 1))).as("i"))
      .distinct()
    val kept = toks
      .select(col("doc_id"), posexplode(col("t")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).as("i"), col("tok"))
      .join(covered, Seq("doc_id", "i"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("i"), col("tok")))),
          s => s.getField("tok"))).as("clean_text"))
    toks.select(col("doc_id"), col("n"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n").cast("bigint").as("n_tokens"),
        (col("n") - coalesce(col("n_kept"), lit(0L))).cast("bigint")
          .as("n_dup_tokens"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Full ANSI replay of [[qSubstrDedup]]: the stride-1 window hashes,
    * the corpus-wide duplicate set, per-token coverage, and the
    * order-preserving rebuild of the cleaned text. */
  val qSubstrDedupSql: String = {
    val k = substrK
    s"""WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |wins AS (
      |  SELECT doc_id, i AS p,
      |    md5(array_to_string(t[i : i+${k - 1}], ' ')) AS wh
      |  FROM toks, LATERAL unnest(generate_series(1, len(t)-${k - 1}))
      |    AS u(i)
      |  WHERE len(t) >= $k),
      |dup AS (SELECT wh FROM wins GROUP BY wh HAVING COUNT(*) > 1),
      |cov AS (
      |  SELECT DISTINCT doc_id, p + o AS i
      |  FROM wins JOIN dup USING (wh),
      |    LATERAL unnest(generate_series(0, ${k - 1})) AS v(o)),
      |tok AS (
      |  SELECT doc_id, i, t[i] AS tok
      |  FROM toks, LATERAL unnest(generate_series(1, len(t))) AS w(i)),
      |kept AS (
      |  SELECT tok.doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
      |    string_agg(tok.tok, ' ' ORDER BY tok.i) AS clean_text
      |  FROM tok LEFT JOIN cov
      |    ON tok.doc_id = cov.doc_id AND tok.i = cov.i
      |  WHERE cov.i IS NULL
      |  GROUP BY tok.doc_id)
      |SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
      |  CAST(len(t.t) - COALESCE(k.n_kept, 0) AS BIGINT) AS n_dup_tokens,
      |  COALESCE(k.clean_text, '') AS clean_text
      |FROM toks t LEFT JOIN kept k USING (doc_id)""".stripMargin
  }

  /** The END-TO-END curation pipeline — the stages above composed the
    * way a training-data run actually chains them, in ONE lazy plan:
    *
    *   quality gates → PII scrub → exact dedup (min-doc_id
    *   representative) → chunk → pack
    *
    * This is the "switch your pipeline to this library" artifact: each
    * stage is the same operator the standalone queries expose, fused by
    * Catalyst into scan-speed map stages wherever possible (gates +
    * scrub + chunking are one codegen'd stage; the dedup groupBy and
    * the pack prefix-sum sort are the only exchanges). Every stage
    * stays deterministic — gates are pure predicates, the dedup
    * survivor is the group's min doc_id (never first-seen), packing
    * order is (doc_id, chunk_id) — so the WHOLE pipeline output
    * hash-matches the oracle's CTE chain, not just each stage alone.
    *
    * [[curateChunks]] is the pipeline up to (and including) chunking —
    * exposed separately because the prefix-sum step executes it eagerly
    * at construction, so THAT is the plan to audit with `.explain`. */
  def qCurate(spark: SparkSession, dir: String): DataFrame =
    graft.operators.PrefixSum.withRunningTotal(
        curateChunks(spark, dir), Seq(col("doc_id"), col("chunk_id")),
        "n_chunk_tokens", "cum_tokens")
      .withColumn("pack_id",
        expr(s"(cum_tokens - n_chunk_tokens) div $packContext"))

  /** KN-gate keep rate: top 3/4 of documents by Kneser-Ney naturalness
    * (−avg bigram nll). Chosen to bracket the heuristic gate's ~87%
    * keep from below so the two variants differ visibly. */
  val knKeepNum = 3L
  val knKeepDen = 4L

  /** The curate pipeline with the KNESER-NEY LM as the quality gate —
    * the `scorer` choice threaded through the same chain (gate → PII
    * scrub → exact dedup → chunk → pack): instead of the heuristic
    * len/punct/stopword predicates, each document is scored by the
    * memoized KN model ([[KneserNey.qKneserNey]] — the strictly
    * stronger scorer the corpus-LM family already built), the gate
    * threshold is CALIBRATED on the corpus by the same two-phase
    * distributed selection q_score_threshold uses
    * ([[CorpusOps.scoreThreshold]] — exact k-th order statistic, no
    * global sort), and everything downstream is shared code with
    * [[qCurate]]. Score = −(kn_nll_micro div n_bigrams) — the integer
    * per-bigram average, higher = more natural; zero-bigram docs are
    * unscorable and drop. Plan shape adds one scoring join (bigrams ⟕
    * vocab-bounded model) and two bounded threshold scans to qCurate's
    * two exchanges — nothing corpus-sorted. */
  def qCurateKn(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val scored = KneserNey.qKneserNey(spark, dir)
      .filter(col("n_bigrams") > 0)
      .selectExpr("doc_id",
        "-(kn_nll_micro div n_bigrams) as score")
    val (sc, release) = graft.util.Checkpoints.checkpointTracked(scored)
    val keptIds =
      try {
        val thr = CorpusOps.scoreThreshold(sc, "score", knKeepNum, knKeepDen)
          .head().getLong(2)
        // the kept id set must outlive the released checkpoint
        sc.filter(col("score") >= thr).select("doc_id").localCheckpoint()
      } finally release()
    val kept = docs.join(keptIds, "doc_id").select("doc_id", "text")
    graft.operators.PrefixSum.withRunningTotal(
        chunkTokens(dedupScrubbed(scrubPii(kept)), col("scrubbed")),
        Seq(col("doc_id"), col("chunk_id")),
        "n_chunk_tokens", "cum_tokens")
      .withColumn("pack_id",
        expr(s"(cum_tokens - n_chunk_tokens) div $packContext"))
  }

  /** The map-only front of the pipeline — quality gates + PII scrub on
    * any (doc_id, text) frame, batch OR streaming (pure narrow
    * projections work identically under Structured Streaming; see
    * [[graft.streaming.CurationStream]]). */
  def gateAndScrub(docs: DataFrame): DataFrame = {
    val t0 = split(col("text"), " ")
    scrubPii(docs.filter(
      length(col("text")) >= 100 &&
        (regexp_count(col("text"), lit("[.,;:!?]")).cast("double") /
          greatest(length(col("text")), lit(1))) <= 0.3 &&
        (size(filter(t0, x => x.isInCollection(stopwords))).cast("double") /
          size(t0)) >= 0.01))
  }

  /** The PII scrub alone — shared by the heuristic gate above and the
    * KN-scored gate ([[qCurateKn]]), so every curate variant redacts
    * identically. */
  def scrubPii(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      regexp_replace(
        regexp_replace(col("text"), piiEmailRe, "<EMAIL>"),
        piiPhoneRe, "<PHONE>").as("scrubbed"))

  /** Exact dedup with the DETERMINISTIC survivor rule: representative =
    * min doc_id per normalized key; the join back on the unique doc_id
    * selects it (dropDuplicates' survivor depends on partitioning).
    * min is commutative/associative, so the result is independent of
    * how rows are batched — the property the streaming ingest path's
    * convergence proof rests on. */
  def dedupScrubbed(scrubbed: DataFrame): DataFrame = {
    val reps = scrubbed
      .groupBy(substring(col("scrubbed"), 1, 40).as("k"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    scrubbed.join(reps, "doc_id")
  }

  def curateChunks(spark: SparkSession, dir: String): DataFrame =
    chunkTokens(
      dedupScrubbed(gateAndScrub(Tables(spark, dir, "documents"))),
      col("scrubbed"))

  /** ScaleCheck twin of [[qCurate]] with a ROTATION-INVARIANT gate
    * (round-13 verdict ask #8): the heuristic gate's stopword
    * predicate collapses on ScaleCheck's rotated corpus (rotation
    * rewrites every vowel, so only copy-0 docs keep stopwords and the
    * big-side kept set — hence the pipeline's OUTPUT — stops growing;
    * its measured scale row proved the plan but not the work). This
    * twin keeps the same plan shape end to end (scan + regexp_count
    * gate → scrub → exact dedup → chunk → prefix-sum pack) but gates
    * on length and punctuation ratio only — both invariant under the
    * rotation/suffix transforms — so the kept set, and with it every
    * downstream stage's input AND output, grows ~factor×: the scale
    * row now times real work at real output volume. Not in the driver
    * query surface: it is a measurement twin, not a product gate. */
  def qCurateInvariant(spark: SparkSession, dir: String): DataFrame = {
    val gated = Tables(spark, dir, "documents").filter(
      length(col("text")) >= 100 &&
        (regexp_count(col("text"), lit("[.,;:!?]")).cast("double") /
          greatest(length(col("text")), lit(1))) <= 0.3)
    graft.operators.PrefixSum.withRunningTotal(
        chunkTokens(dedupScrubbed(scrubPii(gated)), col("scrubbed")),
        Seq(col("doc_id"), col("chunk_id")),
        "n_chunk_tokens", "cum_tokens")
      .withColumn("pack_id",
        expr(s"(cum_tokens - n_chunk_tokens) div $packContext"))
  }

  val qCurateSql: String =
    s"""WITH gated AS (
      |  SELECT doc_id, text FROM documents
      |  WHERE length(text) >= 100
      |    AND CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
      |        / greatest(length(text), 1) <= 0.3
      |    AND CAST(len(list_filter(string_split(text, ' '),
      |          x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
      |        / len(string_split(text, ' ')) >= 0.01),
      |scrub AS (
      |  SELECT doc_id,
      |    regexp_replace(regexp_replace(text,
      |      '$piiEmailRe', '<EMAIL>', 'g'),
      |      '$piiPhoneRe', '<PHONE>', 'g') AS scrubbed
      |  FROM gated),
      |reps AS (
      |  SELECT MIN(doc_id) AS doc_id FROM scrub
      |  GROUP BY substr(scrubbed, 1, 40)),
      |kept AS (SELECT s.* FROM scrub s JOIN reps USING (doc_id)),
      |chunks AS (
      |${chunkSelectSql("kept", "scrubbed").linesIterator
           .map("  " + _).mkString("\n")}
      |),
      |${packAfterChunksSql(", chunk_text")}""".stripMargin

  /** Full ANSI replay of [[qCurateKn]]: the shared KN scoring CTEs,
    * the integer per-bigram score, the k-th-order-statistic threshold
    * (row_number definition — tie-insensitive, so it agrees exactly
    * with the two-phase selection), then the identical scrub → dedup →
    * chunk → pack chain as [[qCurateSql]]. */
  val qCurateKnSql: String =
    s"""WITH ${KneserNey.knScoreCtes},
      |docsc AS (
      |  SELECT doc_id, -(kn_nll_micro // n_bigrams) AS score
      |  FROM scored WHERE n_bigrams > 0),
      |kk AS (
      |  SELECT COUNT(*) AS n,
      |    (COUNT(*) * $knKeepNum + $knKeepDen - 1) // $knKeepDen AS k
      |  FROM docsc),
      |thr AS (
      |  SELECT score AS threshold
      |  FROM (SELECT score, row_number() OVER (ORDER BY score DESC) AS rn
      |        FROM docsc), kk
      |  WHERE rn = k),
      |keptdocs AS (
      |  SELECT d.doc_id, d.text
      |  FROM documents d JOIN docsc USING (doc_id), thr
      |  WHERE docsc.score >= thr.threshold),
      |scrub AS (
      |  SELECT doc_id,
      |    regexp_replace(regexp_replace(text,
      |      '$piiEmailRe', '<EMAIL>', 'g'),
      |      '$piiPhoneRe', '<PHONE>', 'g') AS scrubbed
      |  FROM keptdocs),
      |reps AS (
      |  SELECT MIN(doc_id) AS doc_id FROM scrub
      |  GROUP BY substr(scrubbed, 1, 40)),
      |kept AS (SELECT s.* FROM scrub s JOIN reps USING (doc_id)),
      |chunks AS (
      |${chunkSelectSql("kept", "scrubbed").linesIterator
           .map("  " + _).mkString("\n")}
      |),
      |${packAfterChunksSql(", chunk_text")}""".stripMargin

  /** CURATION AUDIT — per-document provenance of the curate pipeline's
    * verdict: for EVERY document (dropped ones included), which gate it
    * passed and whether it survived exact dedup. The observability
    * operator a production pipeline needs ("why did doc X disappear?",
    * "which gate is responsible for the 12% drop in source Y?") —
    * downstream it aggregates into per-source/per-gate drop rates with
    * plain GROUP BYs. One map-only pass over the corpus for the gate
    * flags plus the same bounded rep aggregation [[dedupScrubbed]]
    * runs; no new shuffle shape. Fully SQL-replayable → hash-checked.
    *
    * Semantics tie: kept = 1 ⟺ the doc_id appears in [[qCurate]]'s
    * input chain (gates passed AND it is its dedup group's min-id
    * representative) — ExtSpec asserts exactly that equivalence. */
  def qCurateAudit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val t0 = split(col("text"), " ")
    val lenOk = length(col("text")) >= 100
    val punctOk = (regexp_count(col("text"), lit("[.,;:!?]"))
      .cast("double") / greatest(length(col("text")), lit(1))) <= 0.3
    val stopOk = (size(filter(t0, x => x.isInCollection(stopwords)))
      .cast("double") / size(t0)) >= 0.01
    val reps = dedupScrubbed(gateAndScrub(docs))
      .select(col("doc_id"), lit(1).as("kept"))
    docs.select(col("doc_id"),
        lenOk.cast("int").as("len_ok"),
        punctOk.cast("int").as("punct_ok"),
        stopOk.cast("int").as("stopword_ok"))
      .join(reps, Seq("doc_id"), "left")
      .select(col("doc_id"), col("len_ok"), col("punct_ok"),
        col("stopword_ok"), coalesce(col("kept"), lit(0)).as("kept"))
  }

  val qCurateAuditSql: String =
    s"""WITH flags AS (
      |  SELECT doc_id,
      |    CAST(length(text) >= 100 AS INTEGER) AS len_ok,
      |    CAST(CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
      |        / greatest(length(text), 1) <= 0.3 AS INTEGER) AS punct_ok,
      |    CAST(CAST(len(list_filter(string_split(text, ' '),
      |          x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
      |        / len(string_split(text, ' ')) >= 0.01 AS INTEGER)
      |      AS stopword_ok
      |  FROM documents),
      |gated AS (
      |  SELECT doc_id, text FROM documents
      |  WHERE length(text) >= 100
      |    AND CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
      |        / greatest(length(text), 1) <= 0.3
      |    AND CAST(len(list_filter(string_split(text, ' '),
      |          x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
      |        / len(string_split(text, ' ')) >= 0.01),
      |scrub AS (
      |  SELECT doc_id,
      |    regexp_replace(regexp_replace(text,
      |      '$piiEmailRe', '<EMAIL>', 'g'),
      |      '$piiPhoneRe', '<PHONE>', 'g') AS scrubbed
      |  FROM gated),
      |reps AS (
      |  SELECT MIN(doc_id) AS doc_id FROM scrub
      |  GROUP BY substr(scrubbed, 1, 40))
      |SELECT f.doc_id, f.len_ok, f.punct_ok, f.stopword_ok,
      |  CAST(CASE WHEN r.doc_id IS NULL THEN 0 ELSE 1 END AS INTEGER)
      |    AS kept
      |FROM flags f LEFT JOIN reps r ON f.doc_id = r.doc_id""".stripMargin

  /** PER-SOURCE CURATION REPORT — [[qCurateAudit]] aggregated to the
    * table an operator actually watches: per source, how many docs
    * failed each gate, how many passed the gates but lost dedup, and
    * the end-to-end keep rate. The "which gate is responsible for the
    * 12% drop in source Y?" dashboard, as one GROUP BY over the audit
    * (map-only flags → partial-agg shuffle keyed by source — source
    * cardinality-sized output, nothing corpus-sized moves). keep_rate
    * is ONE division per output row (portable IEEE), all counts
    * BIGINT. */
  def qCurateReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    qCurateAudit(spark, dir)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy("source")
      .agg(
        count(lit(1)).cast("bigint").as("n_docs"),
        sum(lit(1) - col("len_ok")).cast("bigint").as("len_fail"),
        sum(lit(1) - col("punct_ok")).cast("bigint").as("punct_fail"),
        sum(lit(1) - col("stopword_ok")).cast("bigint").as("stop_fail"),
        sum(when(col("len_ok") === 1 && col("punct_ok") === 1 &&
          col("stopword_ok") === 1 && col("kept") === 0, 1L).otherwise(0L))
          .cast("bigint").as("dedup_drop"),
        sum(col("kept")).cast("bigint").as("kept"))
      .withColumn("keep_rate",
        col("kept").cast("double") / col("n_docs").cast("double"))
  }

  val qCurateReportSql: String =
    s"""SELECT d.source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(1 - a.len_ok) AS BIGINT) AS len_fail,
      |  CAST(SUM(1 - a.punct_ok) AS BIGINT) AS punct_fail,
      |  CAST(SUM(1 - a.stopword_ok) AS BIGINT) AS stop_fail,
      |  CAST(SUM(CASE WHEN a.len_ok = 1 AND a.punct_ok = 1
      |    AND a.stopword_ok = 1 AND a.kept = 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS dedup_drop,
      |  CAST(SUM(a.kept) AS BIGINT) AS kept,
      |  CAST(SUM(a.kept) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
      |    AS keep_rate
      |FROM ($qCurateAuditSql) a
      |JOIN documents d USING (doc_id)
      |GROUP BY d.source""".stripMargin

  /** Within-document repetition ratio — the Gopher-style quality rule
    * that catches boilerplate and generation loops: the fraction of word
    * 2-grams that are repeats of an earlier 2-gram in the same document
    * (0 = no repetition, →1 = the same phrase looping). Computed by the
    * native codegen'd [[org.apache.spark.sql.graftshim.BigramRepRatio]]
    * expression — map-only, no per-row array materialization (the
    * interpreted zip_with + array_distinct composition it replaces,
    * kept as [[repRatioHof]] for the spec cross-check, built and
    * deduped every bigram string). Documents under 2 tokens report 0. */
  def qRepRatio(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents").select(
      col("doc_id"),
      org.apache.spark.sql.graftshim.BigramRepRatio
        .bigramRepRatio(col("text")).as("rep_ratio"))

  /** The HOF formulation of the repetition ratio — the independent
    * reference implementation the spec checks the native expression
    * against. */
  def repRatioHof(c: Column): Column = {
    val t = split(c, " ")
    val n1 = size(t) - 1
    val bi = zip_with(slice(t, lit(1), n1), slice(t, lit(2), n1),
      (x, y) => concat_ws(" ", x, y))
    when(size(t) >= 2,
      lit(1.0) - size(array_distinct(bi)).cast("double") / size(bi))
      .otherwise(lit(0.0))
  }

  val qRepRatioSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bi AS (
      |  SELECT doc_id,
      |    CASE WHEN len(t) >= 2
      |         THEN [t[i] || ' ' || t[i+1] for i in range(1, len(t))]
      |         ELSE [] END AS b
      |  FROM toks)
      |SELECT doc_id,
      |  CASE WHEN len(b) > 0
      |       THEN 1.0 - CAST(len(list_distinct(b)) AS DOUBLE) / len(b)
      |       ELSE 0.0 END AS rep_ratio
      |FROM bi""".stripMargin

  /** Per-group cap — mixture balancing: keep at most [[groupCapN]]
    * documents per (lang, source) cell so no single source dominates the
    * training mix, selected DETERMINISTICALLY (ordered by the md5 of the
    * doc id, the same engine-independent coin as the hash split — never
    * rand() or first-seen).
    *
    * (lang, source) cardinality is BOUNDED — it does not grow with the
    * corpus — so a bare window over it would sort corpus-sized
    * partitions on ~25 tasks at 100 TB. The scale path is a
    * coin-quantile prefilter: one cheap count aggregate gives each
    * group's size gn (25 rows, broadcast back), and only rows whose
    * uniform md5-coin falls below ~4·N/gn survive to the exact window —
    * expected 4·N rows per group regardless of corpus size, so the
    * window sorts O(N) rows per group. The top-N smallest coins are all
    * under the threshold unless fewer than N of E[4N] survivors exist
    * (P[Binom(gn, 4N/gn) < N] ≈ 1e-13 at N=20) — the same
    * vanishing-probability recall contract as the LSH candidate routes,
    * and the oracle's unprefiltered form agrees whenever it holds. */
  val groupCapN = 20

  /** The reusable operator: cap `docs` (doc_id, lang, source) to at most
    * `n` rows per (lang, source) via the coin-quantile prefilter + exact
    * window described above. ExtSpec property-checks it equal to the
    * unprefiltered window across generated skewed corpora. */
  def groupCap(docs: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val coin = md5(col("doc_id").cast("string").cast("binary"))
    // coin as a uniform fraction in [0, 1): first 8 hex digits / 2^32
    val coinFrac = conv(substring(coin, 1, 8), 16, 10)
      .cast("double") / 4294967296.0
    val sizes = docs.groupBy("lang", "source")
      .agg(count(lit(1)).as("gn"))
    val keepFrac = least(lit(1.0), lit(4.0 * n) / col("gn"))
    val pre = docs.join(broadcast(sizes), Seq("lang", "source"))
      .filter(coinFrac < keepFrac)
      .drop("gn")
    val w = Window.partitionBy("lang", "source").orderBy(coin, col("doc_id"))
    pre.select(col("doc_id"), col("lang"), col("source"))
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= n)
  }

  def qGroupCap(spark: SparkSession, dir: String): DataFrame =
    groupCap(Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source")), groupCapN)

  val qGroupCapSql: String =
    s"""SELECT doc_id, lang, source, rk FROM (
      |  SELECT doc_id, lang, source,
      |    CAST(row_number() OVER (
      |      PARTITION BY lang, source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
      |  FROM documents)
      |WHERE rk <= $groupCapN""".stripMargin

  /** TF-IDF top-k terms per document (SURVEY §7.5; the reference's free
    * text column is `AgentComments`, Schemas/renewals_bq.json:117).
    *
    * Plan shape, scale-first: tokenize is a map-only explode; TF is one
    * shuffle on (doc_id, term); DF reuses the TF table (already distinct
    * per (doc, term)) with one shuffle on term; corpus size N joins in
    * as a broadcast 1-row cross join (no driver action, stays lazy);
    * scoring is map-side; top-k is a window partitioned by doc_id —
    * never a global sort. Every shuffle key is a natural key with
    * cardinality that grows with the data, so the plan holds at 100 TB.
    *
    * Float determinism vs the oracle: idf = ln(N/df) where N/df is an
    * IEEE double on both sides; tf*idf is one double multiply. Ties in
    * tfidf (same tf and df) are broken by term. */
  def qTfIdf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir, "documents")
    val tokens = docs.select(
      col("doc_id"),
      explode(split(lower(col("text")), "[^a-z0-9]+")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = tokens.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf") * log(col("n_docs").cast("double") / col("df")))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("term"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("doc_id", "term", "tf", "tfidf", "rk")
  }

  val qTfIdfSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, term, count(*) AS tf FROM tok
      |  WHERE length(term) > 0 GROUP BY 1, 2
      |), dfreq AS (
      |  SELECT term, count(*) AS df FROM tf GROUP BY 1
      |), n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.term, tf.tf,
      |         tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df) AS tfidf
      |  FROM tf JOIN dfreq USING (term) CROSS JOIN n
      |)
      |SELECT doc_id, term, tf, tfidf, rk FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
      |  FROM scored) WHERE rk <= 3""".stripMargin
}
