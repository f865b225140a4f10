package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** WORDPIECE TOKENIZER (Schuster & Nakajima 2012; the BERT tokenizer)
  * — the third production tokenizer family beside [[Bpe]] (frequency
  * merges) and [[Unigram]] (EM pruning). WordPiece is BPE's merge loop
  * with a LIKELIHOOD score: each round merges the pair maximizing
  *
  *   score(l, r) = count(l·r) / (count(l) · count(r))
  *
  * — the pair whose merge most increases corpus likelihood under a
  * unigram-over-symbols model, not the merely most frequent one (rare
  * symbols that almost always co-occur merge early; ubiquitous symbol
  * pairs that co-occur by chance don't). INFERENCE is not merge
  * replay but GREEDY LONGEST-MATCH-FIRST (maximal munch) against the
  * final vocabulary — BERT's WordpieceTokenizer loop.
  *
  * Engine determinism: counts are exact integers; the one float, the
  * selection score, is a single IEEE divide of exact integers with
  * the identical expression tree in both engines (the lm_score
  * posture), ties broken (l, r)-lexicographic; the recorded trace —
  * (rank, left, right, pair_count, left_count, right_count) — is
  * all-integer. Instead of BERT's `##` continuation marker this
  * implementation keeps [[Bpe.eow]] as the word-boundary device
  * (appended before matching, so word-final and word-internal units
  * stay distinct exactly as in training — the same boundary semantics,
  * one sentinel instead of a prefix alphabet, which keeps the three
  * families' token counts directly comparable).
  *
  * Scale shape: identical to [[Bpe.train]] — all corpus-sized work is
  * the one type-table build; each round is one job over |types| rows
  * (pair explode + symbol explode, both partial-agg'd; the argmax is
  * TakeOrdered of 1 row); encoding runs per word TYPE and
  * broadcast-joins to documents, so the corpus pays a hash join, never
  * per-occurrence matching. The greedy matcher is a bounded codegen'd
  * fold (≤ |word|+4 steps, each probing ≤ maxPieceLen substrings
  * against a broadcast vocab map). */
object WordPiece {

  /** Merge rounds for the driver query (production: 10⁴–10⁵). */
  val wpMerges = 15

  /** The trained artifact: the ordered merge trace plus the final
    * vocabulary (final-segmentation symbols ∪ corpus characters ∪
    * [[Bpe.eow]] — characters kept for the coverage guarantee, the
    * standard WordPiece alphabet rule). */
  final case class WpModel(merges: Seq[(Int, String, String, Long, Long, Long)],
                           vocab: Set[String]) {
    def maxPieceLen: Int = if (vocab.isEmpty) 1 else vocab.map(_.length).max
  }

  private def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) => {
      val last = element_at(acc, -1)
      when(size(acc) > 0 && last === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x)))
    })

  /** Train over a (word, n) type table — [[Bpe.train]]'s loop with the
    * likelihood argmax and the final-vocab extraction. Stops early when
    * the best pair's count drops below 2 (a pair seen once can't
    * witness a systematic co-occurrence). */
  def train(types: DataFrame, rounds: Int = wpMerges): WpModel = {
    var (segs, release) = graft.util.Checkpoints.checkpointTracked(
      types.select(col("n"),
        concat(split(col("word"), ""), array(lit(Bpe.eow))).as("syms")))
    val merges = Seq.newBuilder[(Int, String, String, Long, Long, Long)]
    var rank = 0
    var done = false
    try {
      while (rank < rounds && !done) {
        val pairs = segs.select(col("n"), explode(
            arrays_zip(slice(col("syms"), lit(1), size(col("syms")) - 1)
                .as("l"),
              slice(col("syms"), lit(2), size(col("syms")) - 1).as("r")))
            .as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum("n").as("cnt"))
        val syms = segs.select(col("n"), explode(col("syms")).as("s"))
          .groupBy("s").agg(sum("n").as("scnt"))
        val top = pairs
          .join(broadcast(syms.select(col("s").as("l"),
            col("scnt").as("lcnt"))), "l")
          .join(broadcast(syms.select(col("s").as("r"),
            col("scnt").as("rcnt"))), "r")
          .withColumn("score", col("cnt").cast("double") /
            (col("lcnt").cast("double") * col("rcnt").cast("double")))
          .orderBy(col("score").desc, col("l"), col("r")).limit(1)
          .collect()
        if (top.isEmpty || top.head.getAs[Long]("cnt") < 2) done = true
        else {
          val h = top.head
          val (l, r) = (h.getAs[String]("l"), h.getAs[String]("r"))
          merges += ((rank, l, r, h.getAs[Long]("cnt"),
            h.getAs[Long]("lcnt"), h.getAs[Long]("rcnt")))
          val (next, releaseNext) = graft.util.Checkpoints.checkpointTracked(
            segs.select(col("n"), applyMerge(col("syms"), l, r).as("syms")))
          release()
          segs = next
          release = releaseNext
          rank += 1
        }
      }
      val finalSyms = segs.select(explode(col("syms")).as("s"))
        .distinct().collect().map(_.getString(0)).toSet
      val chars = types
        .select(explode(split(col("word"), "")).as("c"))
        .distinct().collect().map(_.getString(0)).toSet
      WpModel(merges.result(), finalSyms ++ chars + Bpe.eow)
    } finally release()
  }

  /** Greedy longest-match-first token COUNT of one word (the
    * [[Bpe.eow]]-augmented form) — a bounded fold: each step consumes
    * the longest vocab piece starting at `pos` (1 char as the
    * out-of-vocab fallback), ≤ |word| steps total. */
  private[graft] def greedyCount(waug: Column, vocab: Set[String],
                                 maxLen: Int): Column = {
    val vm = typedLit(vocab.map(p => p -> 1).toMap)
    aggregate(sequence(lit(1), length(waug)),
      struct(lit(1).as("pos"), lit(0L).as("cnt")),
      (st, _) => {
        val pos = st.getField("pos")
        val cands = transform(
          sequence(lit(1), least(lit(maxLen), length(waug) - pos + 1)),
          l => when(element_at(vm, waug.substr(pos, l)).isNotNull, l))
        val bestl = greatest(coalesce(array_max(cands), lit(1)), lit(1))
        when(pos > length(waug), st).otherwise(
          struct((pos + bestl).as("pos"),
            (st.getField("cnt") + 1L).as("cnt")))
      }).getField("cnt")
  }

  private def typeTable(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))

  private def model(spark: SparkSession, dir: String): WpModel =
    graft.util.SessionCache.memoize(spark, "wordpiece", dir) {
      train(typeTable(Tables(spark, dir, "documents")))
    }

  /** Driver query: the ordered merge trace — every column an exact
    * integer, the likelihood score re-derivable as
    * pair_count/(left_count·right_count). */
  def qWordpieceTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    model(spark, dir).merges
      .toDF("rank", "left", "right", "pair_count", "left_count",
        "right_count")
  }

  /** Driver query: per-document WordPiece token counts — greedy
    * matching per word TYPE, broadcast-joined to the corpus (docs
    * whose words are all empty splits still count the `</w>` token,
    * same accounting as [[Bpe.qBpeEncode]]). */
  def qWordpieceEncode(spark: SparkSession, dir: String): DataFrame = {
    val m = model(spark, dir)
    val docs = Tables(spark, dir, "documents")
    val tokc = typeTable(docs)
      .select(col("word"),
        greedyCount(concat(col("word"), lit(Bpe.eow)), m.vocab,
          m.maxPieceLen).as("ntok"))
    val perDoc = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .join(broadcast(tokc), "word")
      .groupBy("doc_id").agg(sum(col("ntok")).as("s"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("s"), lit(0L)).as("n_wordpiece_tokens"))
  }

  // ----------------------------------------------------------- oracle

  private val f = "chr(31)"
  private val e = "chr(30)"

  /** Training rounds as generated CTEs — [[Bpe.qBpeTrainSql]]'s replay
    * plus a per-round symbol-count CTE and the likelihood argmax. */
  private def trainCtes: String = {
    val rounds = (0 until wpMerges).map { i =>
      s"""p$i AS (
        |  SELECT t[j] AS l, t[j+1] AS r, CAST(SUM(n) AS BIGINT) AS cnt
        |  FROM (SELECT n,
        |          string_split(substr(seg, 2, length(seg) - 2), $e || $f)
        |            AS t
        |        FROM segs$i),
        |       LATERAL unnest(generate_series(1, len(t) - 1)) AS u(j)
        |  GROUP BY 1, 2),
        |s$i AS (
        |  SELECT sym, CAST(SUM(n) AS BIGINT) AS scnt
        |  FROM (SELECT n,
        |          unnest(string_split(substr(seg, 2, length(seg) - 2),
        |            $e || $f)) AS sym
        |        FROM segs$i)
        |  GROUP BY 1),
        |m$i AS MATERIALIZED (
        |  SELECT p.l, p.r, p.cnt, sl.scnt AS lcnt, sr.scnt AS rcnt
        |  FROM p$i p
        |  JOIN s$i sl ON sl.sym = p.l
        |  JOIN s$i sr ON sr.sym = p.r
        |  ORDER BY CAST(p.cnt AS DOUBLE)
        |      / (CAST(sl.scnt AS DOUBLE) * CAST(sr.scnt AS DOUBLE)) DESC,
        |    p.l, p.r
        |  LIMIT 1),
        |segs${i + 1} AS MATERIALIZED (
        |  SELECT n, CASE WHEN (SELECT cnt FROM m$i) >= 2
        |    THEN replace(seg,
        |      (SELECT $f || l || $e || $f || r || $e FROM m$i),
        |      (SELECT $f || l || r || $e FROM m$i))
        |    ELSE seg END AS seg
        |  FROM segs$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH RECURSIVE types AS MATERIALIZED (
      |  SELECT word, COUNT(*) AS n
      |  FROM (SELECT unnest(string_split(text, ' ')) AS word
      |        FROM documents)
      |  GROUP BY word),
      |segs0 AS MATERIALIZED (
      |  SELECT n,
      |    $f || array_to_string(
      |      list_append(string_split(word, ''), '${Bpe.eow}'), $e || $f) ||
      |      $e AS seg
      |  FROM types),
      |$rounds""".stripMargin
  }

  lazy val qWordpieceTrainSql: String = {
    val ranks = (0 until wpMerges).map { i =>
      s"""SELECT $i AS rank, l AS "left", r AS "right", cnt AS pair_count,
         |  lcnt AS left_count, rcnt AS right_count FROM m$i""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""$trainCtes
      |SELECT CAST(rank AS INT) AS rank, "left", "right", pair_count,
      |  left_count, right_count
      |FROM ($ranks)
      |WHERE pair_count >= 2""".stripMargin
  }

  /** Encode replay: vocabulary from the final segmentation (∪ corpus
    * chars ∪ the sentinel), then a recursive greedy maximal-munch walk
    * per word type, token counts broadcast back over the documents. */
  lazy val qWordpieceEncodeSql: String =
    s"""$trainCtes,
      |vocab AS MATERIALIZED (
      |  SELECT DISTINCT piece FROM (
      |    SELECT unnest(string_split(
      |        substr(seg, 2, length(seg) - 2), $e || $f)) AS piece
      |    FROM segs$wpMerges
      |    UNION ALL
      |    SELECT unnest(string_split(word, '')) AS piece FROM types
      |    UNION ALL
      |    SELECT '${Bpe.eow}' AS piece)),
      |vm AS MATERIALIZED (
      |  SELECT map(list(piece ORDER BY piece),
      |      list(1 ORDER BY piece)) AS vm,
      |    (SELECT MAX(length(piece)) FROM vocab) AS maxlen
      |  FROM vocab),
      |enc AS (
      |  SELECT t.word, t.word || '${Bpe.eow}' AS waug, v.vm, v.maxlen,
      |    1 AS pos, CAST(0 AS BIGINT) AS cnt
      |  FROM types t, vm v
      |  UNION ALL
      |  SELECT word, waug, vm, maxlen, pos + bestl, cnt + 1
      |  FROM (
      |    SELECT *, GREATEST(COALESCE(list_max(list_transform(
      |        generate_series(1, least(maxlen, length(waug) - pos + 1)),
      |        l -> CASE WHEN map_extract(vm, substr(waug, pos, l))[1]
      |          IS NOT NULL THEN l END)), 1), 1) AS bestl
      |    FROM enc WHERE pos <= length(waug)) g),
      |tokc AS MATERIALIZED (
      |  SELECT word, cnt AS ntok FROM enc WHERE pos > length(waug)),
      |perdoc AS (
      |  SELECT doc_id, CAST(SUM(ntok) AS BIGINT) AS s
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |        FROM documents) dw
      |  JOIN tokc USING (word)
      |  GROUP BY 1)
      |SELECT d.doc_id, COALESCE(p.s, 0) AS n_wordpiece_tokens
      |FROM documents d LEFT JOIN perdoc p USING (doc_id)""".stripMargin
}
