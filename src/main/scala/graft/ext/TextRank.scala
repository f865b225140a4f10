package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** TEXTRANK KEYWORD EXTRACTION (Mihalcea & Tarau 2004) — the
  * graph-ranking complement to [[TextOps]]' frequency/tf-idf lenses:
  * build the word co-occurrence graph (adjacent non-stopword tokens,
  * symmetrized, edge weight = co-occurrence count) and rank words by
  * weighted PageRank — a word matters because it neighbors words
  * that matter, not because it is frequent. The corpus-level top-k
  * of that ranking is the keyword table a dataset card shows next
  * to its source histograms.
  *
  * DETERMINISM — the [[graft.operators.PageRank]] integer fixed
  * point verbatim: ranks live in units of 10⁻¹² of total mass, each
  * round moves 85% of a node's mass along its edges by INTEGER
  * division (contrib = 850·r·w div (1000·s)), and the oracle replays
  * every round as an unrolled CTE. Ties at the top-k boundary break
  * on the word itself.
  *
  * SCALE. Edge build = one corpus scan → adjacent-pair partial agg
  * (vocab²-bounded in principle, observed-bigram-bounded in fact);
  * K = 3 rounds of join + partial agg over the edge table; strength
  * is folded onto edges once. The rank side broadcasts while the
  * vocab is small and shuffles past [[graft.operators.PageRank
  * .broadcastNodeLimit]]'s posture — here the node set is the VOCAB,
  * which saturates under Heaps' law, so the rounds get relatively
  * cheaper as the corpus grows. */
object TextRank {

  val iters = 3
  val topK = 20
  private val mass = 1000000000000L
  private val baseMass = mass * 15 / 100

  /** Symmetrized co-occurrence edges over any (doc_id, text) frame:
    * (src, dst, w) with stopwords and self-pairs dropped. */
  private[graft] def wordEdges(docs: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    val pairs = arrays_zip(
      slice(t, lit(1), greatest(size(t) - 1, lit(0))).as("w1"),
      slice(t, lit(2), greatest(size(t) - 1, lit(0))).as("w2"))
    val bi = docs.select(explode(pairs).as("p"))
      .select(col("p").getField("w1").as("w1"),
        col("p").getField("w2").as("w2"))
      .filter(col("w1") =!= col("w2") &&
        !col("w1").isInCollection(TextOps.stopwords) &&
        !col("w2").isInCollection(TextOps.stopwords))
    bi.select(col("w1").as("src"), col("w2").as("dst"))
      .union(bi.select(col("w2").as("src"), col("w1").as("dst")))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
  }

  /** Top-[[topK]] keywords: (word, rank). */
  def textrank(docs: DataFrame): DataFrame =
    textrankFromEdges(wordEdges(docs))

  /** The ranking from any (src, dst, w) symmetrized-edge count table
    * (a SUM monoid — the streaming [[graft.streaming.TextStatsStore]]
    * entry). */
  def textrankFromEdges(raw: DataFrame): DataFrame = {
    val strength = raw.groupBy(col("src").as("ssrc"))
      .agg(sum(col("w")).as("s"))
    val (edges, _) = graft.util.Checkpoints.checkpointTracked(
      raw.join(strength, col("src") === col("ssrc")).drop("ssrc"))
    val nodes = edges.select(col("src").as("node")).distinct()
    val n = math.max(nodes.count(), 1L)
    var r = nodes.withColumn("rank", lit(mass / n))
    var release: () => Unit = () => ()
    for (i <- 1 to iters) {
      val contrib = edges
        .join(broadcast(r.withColumnRenamed("node", "src")), "src")
        .select(col("dst"),
          // DECIMAL(38,0)/HUGEINT product: rank·w alone can cross
          // Long range when one hub holds most of the 1e12 mass
          expr("""cast((850 * cast(rank as decimal(38,0)) * w)
                 | div (1000 * s) as bigint)"""
            .stripMargin.replace("\n", " ")).as("c"))
        .groupBy("dst").agg(sum(col("c")).as("cs"))
      val next = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(baseMass / n) + coalesce(col("cs"), lit(0L))).as("rank"))
      if (i < iters) {
        val (ck, rel) = graft.util.Checkpoints.checkpointTracked(next)
        release(); release = rel
        r = ck
      } else r = next
    }
    r.select(col("node").as("word"), col("rank"))
      .orderBy(col("rank").desc, col("word").asc)
      .limit(topK)
  }

  def qTextrank(spark: SparkSession, dir: String): DataFrame =
    textrank(Tables(spark, dir, "documents"))

  /** Full-replay oracle: edge build + every rank round unrolled (the
    * [[graft.operators.PageRank]] oracle pattern; AS MATERIALIZED so
    * DuckDB evaluates each round once). */
  val qTextrankSql: String = {
    val stop = TextOps.stopwords.map(s => s"'$s'").mkString(", ")
    val per = (1 to iters).map { i =>
      s"""r$i AS MATERIALIZED (
         |  SELECT n.node,
         |    $baseMass // (SELECT n FROM nn)
         |      + COALESCE(CAST(SUM(CAST(
         |          (850 * CAST(r.rank AS HUGEINT) * e.w)
         |            // (1000 * e.s) AS BIGINT)) AS BIGINT), 0)
         |      AS rank
         |  FROM nodes n
         |  LEFT JOIN edges e ON e.dst = n.node
         |  LEFT JOIN r${i - 1} r ON r.node = e.src
         |  GROUP BY n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH toks AS (
       |  SELECT string_split(text, ' ') AS t FROM documents),
       |bi AS (
       |  SELECT t[i] AS w1, t[i+1] AS w2
       |  FROM toks, LATERAL unnest(generate_series(1, len(t)-1)) AS u(i)
       |  WHERE t[i] <> t[i+1]
       |    AND t[i] NOT IN ($stop) AND t[i+1] NOT IN ($stop)),
       |edges0 AS (
       |  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM (
       |    SELECT w1 AS src, w2 AS dst FROM bi
       |    UNION ALL
       |    SELECT w2 AS src, w1 AS dst FROM bi)
       |  GROUP BY 1, 2),
       |strength AS (SELECT src, CAST(SUM(w) AS BIGINT) AS s
       |  FROM edges0 GROUP BY 1),
       |edges AS MATERIALIZED (
       |  SELECT e.src, e.dst, e.w, st.s
       |  FROM edges0 e JOIN strength st ON st.src = e.src),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
       |nn AS (SELECT GREATEST(COUNT(*), 1) AS n FROM nodes),
       |r0 AS (SELECT node, $mass // (SELECT n FROM nn) AS rank
       |  FROM nodes),
       |$per
       |SELECT node AS word, CAST(rank AS BIGINT) AS rank
       |FROM r$iters
       |ORDER BY rank DESC, word ASC
       |LIMIT $topK""".stripMargin
  }
}
