package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** UNIGRAM-LM TOKENIZER (Kudo 2018, arXiv:1804.10959 — the
  * SentencePiece unigram model): the second production tokenizer
  * family beside [[Bpe]]. Where BPE grows a vocabulary bottom-up by
  * merging, unigram starts from an over-complete substring inventory
  * and PRUNES it down with EM: score every candidate piece by how much
  * the corpus actually uses it under the current model, keep the
  * winners, re-estimate, repeat. Encoding is Viterbi: each word's
  * minimum-cost segmentation under the final piece costs.
  *
  * This implementation is the deterministic hard-EM variant (Viterbi
  * counts for the E-step — reference SentencePiece offers exactly this
  * as its fast path), with every likelihood quantized to INTEGER
  * MICRONATS before any decision (the [[CorpusOps.lmScoreWith]]
  * convention), so training and encoding are hash-checkable end to
  * end — the property no float-state tokenizer trainer has:
  *
  *  - SEED: all substrings of length ≤ [[seedMaxLen]] with weighted
  *    corpus count ≥ [[seedMinCount]], plus every single character
  *    (coverage guarantee: a Viterbi path always exists);
  *  - COST: round(ln((total + |V|) / (cnt + 1)) · 10⁶) as BIGINT —
  *    add-one smoothing keeps zero-usage characters finite;
  *  - E-STEP: Viterbi-segment every word TYPE (never the corpus — the
  *    type table is the bounded surface, [[Bpe.train]]'s posture) and
  *    sum piece usage weighted by type frequency;
  *  - PRUNE (M-step): keep the top [[keepCaps]](r) multi-character
  *    pieces by (usage desc, piece asc) plus all characters, then
  *    re-estimate costs from the kept usage counts;
  *  - VITERBI: dp over word positions, candidate pieces end at the
  *    current position with length ≤ [[seedMaxLen]]; ties break to
  *    the LONGEST piece via min over (cost, start) structs — the
  *    same total order in Spark (`array_min` of structs) and DuckDB
  *    (`list_min` of structs), so segmentations are engine-identical.
  *
  * Scale shape: the corpus-sized work is one explode + partial-agg
  * (the type table build, shared with [[Bpe]]); every EM round is one
  * Spark job over |types| rows with a bounded (≤ a few hundred piece)
  * cost map in the plan, and the bounded per-round vocab is the only
  * driver state. Encoding at corpus scale goes through the TYPE
  * table too: token counts are computed once per distinct word and
  * broadcast-joined to the document stream — at a production 10⁵-piece
  * vocabulary the cost map travels as a broadcast table exactly like
  * [[Bpe.encodeFast]]'s merge table (the literal map here is sized to
  * the oracle-scale vocab).
  *
  * The oracle ([[qUnigramTrainSql]]) replays the ENTIRE training loop
  * in SQL — recursive-CTE Viterbi (dp list + backtrack per word) per
  * EM round, the winnow/BPE full-replay technique — so the driver
  * hash-checks every (round, piece, cnt, cost_micro) row of the
  * training trace, seed included. */
object Unigram {

  /** Longest candidate piece. */
  val seedMaxLen = 4
  /** Weighted corpus-count floor for multi-char seed pieces. */
  val seedMinCount = 100L
  /** EM prune rounds for the driver query (production runs more; the
    * per-round shape is identical). */
  val emRounds = 3
  /** Multi-char vocabulary cap after each EM round. */
  val keepCaps: Seq[Int] = Seq(64, 48, 32)
  /** Cost of an unknown piece — any valid path beats it, and
    * len·INF stays far under Long.Max. */
  val inf = 1000000000000L

  /** The trained artifact: per-round vocab traces
    * (piece, usage_count, cost_micro), index 0 = seed. */
  final case class UnigramModel(rounds: Seq[Seq[(String, Long, Long)]]) {
    def finalCosts: Map[String, Long] =
      rounds.last.map(t => t._1 -> t._3).toMap
  }

  /** The word-type frequency table — identical tokenization to
    * [[Bpe.qBpeTrain]]'s types, with empties dropped so arbitrary
    * whitespace can't mint an empty piece. */
  private def typeTable(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Viterbi dp fill: dp(0)=0 at index 1; dp(t) = min over candidate
    * starts s ∈ [max(1, t−L+1), t] of dp(s−1) + cost(word[s..t]) —
    * one codegen'd fold, no shuffle. */
  private[graft] def vitDp(word: Column, costs: Map[String, Long]): Column = {
    val cmap = typedLit(costs)
    aggregate(sequence(lit(1), length(word)), array(lit(0L)),
      (acc, t) => {
        val cands = transform(
          sequence(greatest(lit(1), t - (seedMaxLen - 1)), t),
          s => element_at(acc, s) +
            coalesce(element_at(cmap, word.substr(s, t - s + 1)), lit(inf)))
        concat(acc, array(array_min(cands)))
      })
  }

  /** Viterbi backtrack over a precomputed dp column: walk from the end,
    * at each position re-derive the argmin candidate as min over
    * (cost, start) structs — min cost first, then smallest start =
    * LONGEST piece, the deterministic tie the oracle mirrors. The fold
    * runs |word| steps; finished states (pos ≤ 0) pass through. */
  private[graft] def vitToksFromDp(word: Column, dp: Column,
                                 costs: Map[String, Long]): Column = {
    val cmap = typedLit(costs)
    aggregate(sequence(lit(1), length(word)),
      struct(length(word).as("pos"),
        array().cast("array<string>").as("toks")),
      (st, _) => {
        val pos = st.getField("pos")
        val cands = transform(
          sequence(greatest(lit(1), pos - (seedMaxLen - 1)), pos),
          s => struct(
            (element_at(dp, s) +
              coalesce(element_at(cmap, word.substr(s, pos - s + 1)),
                lit(inf))).as("c"),
            s.as("s")))
        val bs = array_min(cands).getField("s")
        when(pos <= 0, st).otherwise(struct(
          (bs - 1).as("pos"),
          concat(array(word.substr(bs, pos - bs + 1)),
            st.getField("toks")).as("toks")))
      }).getField("toks")
  }

  /** Attach integer-micronat costs to a (piece, cnt) vocab — computed
    * through the ENGINE's ln (one bounded job) so the quantized values
    * pair with DuckDB's ln exactly as [[CorpusOps.lmScoreWith]]'s
    * proven-green convention does. */
  private def withCosts(spark: SparkSession,
                        counts: Seq[(String, Long)])
      : Seq[(String, Long, Long)] = {
    import spark.implicits._
    val total = counts.map(_._2).sum
    val nv = counts.size.toLong
    counts.toDF("piece", "cnt")
      .select(col("piece"), col("cnt"),
        round(log(lit(total + nv).cast("double") /
          (col("cnt").cast("double") + lit(1.0))) * 1e6)
          .cast("bigint").as("cost"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
  }

  /** Train over a (word, n) type table: seed, then [[emRounds]] hard-EM
    * prune rounds. Driver state is the bounded vocab only; each round
    * is one distributed usage-count job over |types| rows. */
  def train(types: DataFrame): UnigramModel = {
    val spark = types.sparkSession
    val allSubs = flatten(transform(
      sequence(lit(1), length(col("word"))), s =>
        transform(
          sequence(lit(1),
            least(lit(seedMaxLen), length(col("word")) - s + 1)),
          l => col("word").substr(s, l))))
    val seedCounts = types
      .select(col("n"), explode(allSubs).as("piece"))
      .groupBy("piece").agg(sum("n").as("cnt"))
      .filter(col("cnt") >= seedMinCount || length(col("piece")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
    val chars = seedCounts.map(_._1).filter(_.length == 1)
    var cur = withCosts(spark, seedCounts)
    val rounds = Seq.newBuilder[Seq[(String, Long, Long)]]
    rounds += cur
    for (r <- 0 until emRounds) {
      val costMap = cur.map(t => t._1 -> t._3).toMap
      val usage = types
        .withColumn("dp", vitDp(col("word"), costMap))
        .select(col("n"),
          explode(vitToksFromDp(col("word"), col("dp"), costMap))
            .as("piece"))
        .groupBy("piece").agg(sum("n").as("cnt"))
        .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
      val keptMulti = usage.toSeq.filter(_._1.length > 1)
        .sortBy { case (p, c) => (-c, p) }.take(keepCaps(r))
      val keptChars = chars.map(c => c -> usage.getOrElse(c, 0L))
      cur = withCosts(spark, (keptMulti ++ keptChars).sortBy(_._1))
      rounds += cur
    }
    UnigramModel(rounds.result())
  }

  private def model(spark: SparkSession, dir: String): UnigramModel =
    graft.util.SessionCache.memoize(spark, "unigram", dir) {
      train(typeTable(Tables(spark, dir, "documents")))
    }

  /** Per-TYPE token counts under the final model — the bounded table
    * the encode path broadcast-joins (token count is a pure function
    * of the word, so the corpus never runs Viterbi per occurrence). */
  private def typeTokenCounts(spark: SparkSession, dir: String,
                              m: UnigramModel): DataFrame = {
    val costs = m.finalCosts
    typeTable(Tables(spark, dir, "documents"))
      .withColumn("dp", vitDp(col("word"), costs))
      .select(col("word"),
        size(vitToksFromDp(col("word"), col("dp"), costs))
          .cast("bigint").as("ntok"))
  }

  /** Driver query: the full training trace — (round, piece, cnt,
    * cost_micro) for the seed (round 0) and every EM round. */
  def qUnigramTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    model(spark, dir).rounds.zipWithIndex
      .flatMap { case (vs, r) => vs.map(v => (r, v._1, v._2, v._3)) }
      .toDF("round", "piece", "cnt", "cost_micro")
  }

  /** Driver query: per-document unigram token counts via the
    * type-table broadcast join (docs with no words count 0). */
  def qUnigramEncode(spark: SparkSession, dir: String): DataFrame = {
    val tokc = typeTokenCounts(spark, dir, model(spark, dir))
    val docs = Tables(spark, dir, "documents")
    val perDoc = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(tokc), "word")
      .groupBy("doc_id").agg(sum(col("ntok")).as("s"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("s"), lit(0L)).as("n_unigram_tokens"))
  }

  /** Driver query: the tokenizer-quality comparison row set — BPE,
    * unigram and WordPiece fertility over the same corpus, one row
    * each, so the three families are graded side by side (lower
    * fertility = better compression at the same whitespace-word
    * denominator). */
  def qTokenizerCompare(spark: SparkSession, dir: String): DataFrame = {
    val bpe = Bpe.qBpeStats(spark, dir)
      .select(lit("bpe").as("tokenizer"), col("n_docs"), col("n_words"),
        col("n_bpe_tokens").as("n_tokens"), col("fertility"))
    val words = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("bigint").as("n_words"))
    def statsRow(enc: DataFrame, tokCol: String, name: String): DataFrame =
      enc.join(words, "doc_id")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).cast("bigint").as("n_words"),
          sum(col(tokCol)).cast("bigint").as("n_tokens"))
        .select(lit(name).as("tokenizer"), col("n_docs"),
          col("n_words"), col("n_tokens"),
          (col("n_tokens").cast("double") / col("n_words"))
            .as("fertility"))
    bpe
      .unionAll(statsRow(qUnigramEncode(spark, dir),
        "n_unigram_tokens", "unigram"))
      .unionAll(statsRow(WordPiece.qWordpieceEncode(spark, dir),
        "n_wordpiece_tokens", "wordpiece"))
  }

  // ----------------------------------------------------------- oracle

  private val infSql = s"CAST($inf AS BIGINT)"
  private val lm1 = seedMaxLen - 1

  /** One Viterbi pass in SQL: recursive dp-list fill + recursive
    * backtrack, against the cost map of CTE `c$from`, emitting
    * `toks$r` (word, n, toks). The dp recursion carries the growing
    * cost list per word; the backtrack re-derives each argmin as
    * `list_min` over (cost, start) structs — the identical total
    * order as the Spark fold. */
  private def vitSql(r: Int, from: String): String =
    s"""m$r AS MATERIALIZED (
      |  SELECT map(list(piece ORDER BY piece), list(cost ORDER BY piece))
      |    AS vm FROM $from),
      |dp$r AS (
      |  SELECT t.word, t.n, m.vm, 0 AS i, [CAST(0 AS BIGINT)] AS dp
      |  FROM types t, m$r m
      |  UNION ALL
      |  SELECT word, n, vm, i + 1,
      |    list_append(dp, list_min(list_transform(
      |      generate_series(greatest(1, i + 1 - $lm1), i + 1),
      |      s -> dp[s] + COALESCE(
      |        map_extract(vm, substr(word, s, i + 2 - s))[1], $infSql))))
      |  FROM dp$r WHERE i < length(word)),
      |bt$r AS (
      |  SELECT word, n, vm, dp, length(word) AS pos,
      |    CAST([] AS VARCHAR[]) AS toks
      |  FROM dp$r WHERE i = length(word)
      |  UNION ALL
      |  SELECT word, n, vm, dp,
      |    struct_extract(best, 's') - 1 AS pos,
      |    list_prepend(substr(word, struct_extract(best, 's'),
      |      pos - struct_extract(best, 's') + 1), toks) AS toks
      |  FROM (
      |    SELECT *, list_min(list_transform(
      |      generate_series(greatest(1, pos - $lm1), pos),
      |      s -> {'c': dp[s] + COALESCE(
      |          map_extract(vm, substr(word, s, pos - s + 1))[1], $infSql),
      |        's': s})) AS best
      |    FROM bt$r WHERE pos > 0) q$r),
      |toks$r AS MATERIALIZED (
      |  SELECT word, n, toks FROM bt$r WHERE pos = 0)""".stripMargin

  /** Integer-micronat cost projection over vocab CTE `k`. */
  private def costSql(k: String): String =
    s"""SELECT piece, cnt,
      |  CAST(round(ln(CAST((SELECT SUM(cnt) FROM $k)
      |      + (SELECT COUNT(*) FROM $k) AS DOUBLE)
      |    / (CAST(cnt AS DOUBLE) + 1.0)) * 1000000.0) AS BIGINT) AS cost
      |FROM $k""".stripMargin

  /** The shared CTE prefix: seed + every EM round (usage, prune,
    * re-cost) — ends with c[emRounds] holding the final vocab. */
  private def trainCtes: String = {
    val rounds = (1 to emRounds).map { r =>
      s"""${vitSql(r, s"c${r - 1}")},
        |u$r AS MATERIALIZED (
        |  SELECT piece, CAST(SUM(n) AS BIGINT) AS cnt
        |  FROM (SELECT n, unnest(toks) AS piece FROM toks$r) GROUP BY 1),
        |k$r AS MATERIALIZED (
        |  SELECT piece, cnt FROM (
        |    SELECT piece, cnt FROM u$r WHERE length(piece) > 1
        |    ORDER BY cnt DESC, piece LIMIT ${keepCaps(r - 1)})
        |  UNION ALL
        |  SELECT c.piece, COALESCE(u.cnt, 0) AS cnt
        |  FROM (SELECT piece FROM c${r - 1} WHERE length(piece) = 1) c
        |  LEFT JOIN u$r u USING (piece)),
        |c$r AS MATERIALIZED (
        |${costSql(s"k$r").linesIterator.map("  " + _).mkString("\n")})"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH RECURSIVE types AS MATERIALIZED (
      |  SELECT word, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM (SELECT unnest(string_split(text, ' ')) AS word
      |        FROM documents)
      |  WHERE word <> '' GROUP BY 1),
      |subs AS MATERIALIZED (
      |  SELECT piece, CAST(SUM(n) AS BIGINT) AS cnt
      |  FROM (SELECT n, substr(word, s, l) AS piece
      |        FROM types,
      |          LATERAL unnest(generate_series(1, length(word))) AS a(s),
      |          LATERAL unnest(generate_series(1,
      |            least($seedMaxLen, length(word) - s + 1))) AS b(l))
      |  GROUP BY 1),
      |k0 AS MATERIALIZED (
      |  SELECT piece, cnt FROM subs
      |  WHERE cnt >= $seedMinCount OR length(piece) = 1),
      |c0 AS MATERIALIZED (
      |${costSql("k0").linesIterator.map("  " + _).mkString("\n")}),
      |$rounds""".stripMargin
  }

  /** Full SQL replay of training: every (round, piece, cnt,
    * cost_micro) row of the trace, seed included. */
  lazy val qUnigramTrainSql: String = {
    val legs = (0 to emRounds).map(r =>
      s"SELECT CAST($r AS INT) AS round, piece, cnt, cost AS cost_micro " +
        s"FROM c$r").mkString("\nUNION ALL\n")
    s"""$trainCtes
      |$legs""".stripMargin
  }

  /** SQL replay of encode: one more Viterbi pass under the final
    * vocab, token counts per type, joined back to the documents. */
  lazy val qUnigramEncodeSql: String = {
    val enc = emRounds + 1
    s"""$trainCtes,
      |${vitSql(enc, s"c$emRounds")},
      |tokc AS MATERIALIZED (
      |  SELECT word, CAST(len(toks) AS BIGINT) AS ntok FROM toks$enc),
      |perdoc AS (
      |  SELECT doc_id, CAST(SUM(ntok) AS BIGINT) AS s
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |        FROM documents) dw
      |  JOIN tokc USING (word)
      |  WHERE word <> ''
      |  GROUP BY 1)
      |SELECT d.doc_id, COALESCE(p.s, 0) AS n_unigram_tokens
      |FROM documents d LEFT JOIN perdoc p USING (doc_id)""".stripMargin
  }

  /** SQL twin of the comparison rows: the BPE stats oracle UNION the
    * unigram and WordPiece encode oracles' aggregates. */
  lazy val qTokenizerCompareSql: String =
    s"""WITH bpestats AS (
      |${Bpe.qBpeStatsSql.linesIterator.map("  " + _).mkString("\n")}
      |),
      |unienc AS (
      |${qUnigramEncodeSql.linesIterator.map("  " + _).mkString("\n")}
      |),
      |wpenc AS (
      |${WordPiece.qWordpieceEncodeSql.linesIterator
           .map("  " + _).mkString("\n")}
      |),
      |uniwords AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
      |  FROM documents)
      |SELECT 'bpe' AS tokenizer, n_docs, n_words,
      |  n_bpe_tokens AS n_tokens, fertility
      |FROM bpestats
      |UNION ALL
      |SELECT 'unigram' AS tokenizer,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(w.n_words) AS BIGINT) AS n_words,
      |  CAST(SUM(e.n_unigram_tokens) AS BIGINT) AS n_tokens,
      |  CAST(SUM(e.n_unigram_tokens) AS DOUBLE)
      |    / CAST(SUM(w.n_words) AS BIGINT) AS fertility
      |FROM unienc e JOIN uniwords w USING (doc_id)
      |UNION ALL
      |SELECT 'wordpiece' AS tokenizer,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(w.n_words) AS BIGINT) AS n_words,
      |  CAST(SUM(e.n_wordpiece_tokens) AS BIGINT) AS n_tokens,
      |  CAST(SUM(e.n_wordpiece_tokens) AS DOUBLE)
      |    / CAST(SUM(w.n_words) AS BIGINT) AS fertility
      |FROM wpenc e JOIN uniwords w USING (doc_id)""".stripMargin
}
