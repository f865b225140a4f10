package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** FELLEGI–SUNTER PROBABILISTIC RECORD LINKAGE (Fellegi & Sunter 1969,
  * JASA — the model behind every production linker: Splink, dedupe.io,
  * census matching). A "dirty" replica of the customer register is
  * derived in-query by deterministic md5-coin field corruption (the
  * repo-wide seeded-corruption convention — replayable in any engine,
  * and the ground truth stays known so the linkage is EVALUABLE), then
  * linked back to the clean register:
  *
  *  - BLOCKING, two passes (the standard recall-union): exact name,
  *    and exact (nation, segment). A pair survives if ANY pass emits
  *    it — records with name AND region noise are lost here, which is
  *    exactly the blocking-recall number q_linkage_eval reports.
  *  - COMPARISON VECTOR γ over four fields: name, nation, segment,
  *    acctbal-bucket (floor(acctbal/1000)).
  *  - FS WEIGHTS: agreement w_f = ln(m_f/u_f), disagreement
  *    w'_f = ln((1−m_f)/(1−u_f)). u_f (chance agreement of two random
  *    records) comes from the CLEAN-side value-frequency identity
  *    u = Σ_v cnt_v² / n² — the standard frequency-based u estimate
  *    (Splink's `estimate_u`); m_f are the stated per-field retention
  *    rates of the corruption model (1 − corruption rate ± the bucket
  *    spill), the honest generative truth a production deployment
  *    would EM-estimate.
  *  - DECISION: match iff Σ weights ≥ ln(100) (posterior odds 100:1
  *    under the naive-Bayes reading), non-match below 0, else
  *    'possible' — the FS three-way rule.
  *
  * DETERMINISM. Corruption coins are md5 folds; u is an exact integer
  * ratio (Σcnt² in DECIMAL(38,0)/HUGEINT so no 100 TB overflow); each
  * of the 8 weights is ONE ln of one identically-shaped double
  * expression, micro-quantized to integer nats (the q_lm_score
  * convention), so the pair score is an exact integer SUM of integer
  * weights — order-free, engine-portable — and the decision compares
  * integers against integer thresholds.
  *
  * SCALE. Never all-pairs: candidates are the union of two equi-join
  * blocking passes (hash joins on bounded-cardinality keys; AQE skew
  * split handles hot blocks), weights ride a broadcast 1-row frame,
  * and scoring is map-side over the candidate table. The eval is one
  * partial agg over candidates. This is the same bucket-then-verify
  * posture as PassJoin ([[FuzzyJoin]]) with a probabilistic decision
  * layer on top. */
object RecordLinkage {

  /** Per-field corruption rates (%), md5-coin on the record key. */
  val corruptNamePct = 15
  val corruptNationPct = 10
  val corruptSegPct = 10
  val corruptBalPct = 20

  /** Per-field m (P[field agrees | true match]) — the corruption
    * model's own retention rates, stated as exact decimal literals so
    * both engines parse the identical double. */
  val mName = "0.85"; val mdName = "0.15"
  val mNation = "0.90"; val mdNation = "0.10"
  val mSeg = "0.90"; val mdSeg = "0.10"
  val mBal = "0.80"; val mdBal = "0.20"

  /** Match threshold: ln(100)·1e6 (100:1 likelihood odds); lower
    * threshold 0 (even odds) → three-way match/possible/non_match. */
  val upperMicro = 4605170L

  private def coin(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit("fs" + salt), key.cast(StringType))
      .cast(BinaryType)), 1, 15), 16, 10).cast(LongType) % 100

  /** Clean register: normalized comparison fields off one scan. */
  def cleanSide(customer: DataFrame): DataFrame =
    customer.select(
      col("c_custkey").as("key"),
      col("c_name").as("name"),
      col("c_nationkey").as("nation"),
      col("c_mktsegment").as("seg"),
      expr("cast(floor(c_acctbal / 1000.0) as bigint)").as("bal"))

  /** Dirty replica: per-field md5-coin corruption. Name: last char →
    * 'X' (never collides with a clean name); nation: +1 mod 25; seg:
    * reversed (leaves the 5-value domain); bal: next bucket. */
  def dirtySide(clean: DataFrame): DataFrame =
    clean.select(col("key"),
      when(coin(col("key"), "name") < corruptNamePct,
        concat(expr("substr(name, 1, length(name) - 1)"), lit("X")))
        .otherwise(col("name")).as("name_d"),
      when(coin(col("key"), "nation") < corruptNationPct,
        (col("nation") + 1) % 25).otherwise(col("nation")).as("nation_d"),
      when(coin(col("key"), "seg") < corruptSegPct, reverse(col("seg")))
        .otherwise(col("seg")).as("seg_d"),
      when(coin(col("key"), "bal") < corruptBalPct, col("bal") + 1)
        .otherwise(col("bal")).as("bal_d"))

  /** FS weight table: ONE row, 8 micro-nat integer weights, from the
    * clean-side frequency statistics. Σcnt² in DECIMAL(38,0). */
  def weights(clean: DataFrame): DataFrame = {
    def s2(c: String): DataFrame = clean.groupBy(col(c))
      .agg(count(lit(1)).as("cnt"))
      .agg(sum(col("cnt").cast(DecimalType(38, 0)) * col("cnt"))
        .as(s"s2_$c"))
    val stats = clean.agg(count(lit(1)).as("n"))
      .crossJoin(s2("name")).crossJoin(s2("nation"))
      .crossJoin(s2("seg")).crossJoin(s2("bal"))
    def u(f: String): String =
      s"(cast(s2_$f as double) / (cast(n as double) * cast(n as double)))"
    def w(f: String, m: String, md: String): Seq[String] = Seq(
      s"cast(round(1000000.0 * ln($m / ${u(f)})) as bigint) as wa_$f",
      s"cast(round(1000000.0 * ln($md / (1.0 - ${u(f)}))) as bigint) as wd_$f")
    stats.selectExpr(
      (w("name", mName, mdName) ++ w("nation", mNation, mdNation) ++
        w("seg", mSeg, mdSeg) ++ w("bal", mBal, mdBal)): _*)
  }

  /** Scored candidate pairs: (d_id, cand_key, γ bits, integer score,
    * three-way decision, ground-truth bit). */
  def linkPairs(customer: DataFrame): DataFrame = {
    val clean = cleanSide(customer)
    val dirty = dirtySide(clean)
    val d = dirty.alias("d")
    val c = clean.alias("c")
    val p1 = d.join(c, col("d.name_d") === col("c.name"))
      .select(col("d.key").as("d_id"), col("c.key").as("cand_key"))
    val p2 = d.join(c, col("d.nation_d") === col("c.nation") &&
        col("d.seg_d") === col("c.seg"))
      .select(col("d.key").as("d_id"), col("c.key").as("cand_key"))
    val cand = p1.union(p2).distinct()
    val pairs = cand
      .join(dirty.withColumnRenamed("key", "d_id"), Seq("d_id"))
      .join(clean.select(col("key").as("cand_key"), col("name").as("c_nm"),
        col("nation").as("c_nat"), col("seg").as("c_sg"),
        col("bal").as("c_bl")), Seq("cand_key"))
      .select(col("d_id"), col("cand_key"),
        (col("name_d") === col("c_nm")).cast(IntegerType).as("g_name"),
        (col("nation_d") === col("c_nat")).cast(IntegerType).as("g_nation"),
        (col("seg_d") === col("c_sg")).cast(IntegerType).as("g_seg"),
        (col("bal_d") === col("c_bl")).cast(IntegerType).as("g_bal"))
    pairs.crossJoin(broadcast(weights(clean)))
      .selectExpr("d_id", "cand_key", "g_name", "g_nation", "g_seg", "g_bal",
        """g_name * wa_name + (1 - g_name) * wd_name
          | + g_nation * wa_nation + (1 - g_nation) * wd_nation
          | + g_seg * wa_seg + (1 - g_seg) * wd_seg
          | + g_bal * wa_bal + (1 - g_bal) * wd_bal as score_micro"""
          .stripMargin.replace("\n", ""))
      .withColumn("decision",
        when(col("score_micro") >= upperMicro, "match")
          .when(col("score_micro") < 0L, "non_match")
          .otherwise("possible"))
      .withColumn("is_true",
        (col("d_id") === col("cand_key")).cast(IntegerType))
  }

  /** One-row readout: pair volume, decision quality vs ground truth,
    * and blocking recall (the pairs the union-blocking lost). */
  def linkageEval(customer: DataFrame): DataFrame = {
    val n = cleanSide(customer).agg(count(lit(1)).as("n_records"))
    linkPairs(customer).agg(
        count(lit(1)).as("n_pairs"),
        sum(col("is_true").cast(LongType)).as("blocking_found"),
        sum((col("decision") === "match").cast(LongType)).as("n_matches"),
        sum((col("decision") === "match" && col("is_true") === 1)
          .cast(LongType)).as("tp"))
      .crossJoin(broadcast(n))
      .selectExpr("n_records", "n_pairs", "blocking_found", "n_matches", "tp",
        """case when n_matches = 0 then 0 else
          | cast(round(1000000.0 * tp / n_matches) as bigint) end
          | as precision_micro""".stripMargin.replace("\n", ""),
        "cast(round(1000000.0 * tp / n_records) as bigint) as recall_micro",
        """cast(round(1000000.0 * blocking_found / n_records) as bigint)
          | as blocking_recall_micro""".stripMargin.replace("\n", ""))
  }

  def qRecordLinkage(spark: SparkSession, dir: String): DataFrame =
    linkPairs(Tables(spark, dir, "customer"))

  def qLinkageEval(spark: SparkSession, dir: String): DataFrame =
    linkageEval(Tables(spark, dir, "customer"))

  /** Shared oracle CTE chain: clean → dirty → candidates → weights →
    * scored pairs, mirroring every double-expression shape. */
  private def pairCtes: String = {
    def cn(salt: String): String =
      s"CAST(CAST('0x' || substr(md5('fs$salt' || CAST(key AS VARCHAR)), " +
        "1, 15) AS UBIGINT) AS BIGINT) % 100"
    def u(f: String): String =
      s"(CAST(s2_$f AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))"
    def w(f: String, m: String, md: String): String =
      s"""CAST(round(1000000.0 * ln($m / ${u(f)})) AS BIGINT) AS wa_$f,
         |    CAST(round(1000000.0 * ln($md / (1.0 - ${u(f)}))) AS BIGINT)
         |      AS wd_$f""".stripMargin
    s"""clean AS MATERIALIZED (
       |  SELECT c_custkey AS key, c_name AS name, c_nationkey AS nation,
       |    c_mktsegment AS seg,
       |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal
       |  FROM customer),
       |dirty AS MATERIALIZED (
       |  SELECT key,
       |    CASE WHEN ${cn("name")} < $corruptNamePct
       |      THEN substr(name, 1, length(name) - 1) || 'X'
       |      ELSE name END AS name_d,
       |    CASE WHEN ${cn("nation")} < $corruptNationPct
       |      THEN (nation + 1) % 25 ELSE nation END AS nation_d,
       |    CASE WHEN ${cn("seg")} < $corruptSegPct
       |      THEN reverse(seg) ELSE seg END AS seg_d,
       |    CASE WHEN ${cn("bal")} < $corruptBalPct
       |      THEN bal + 1 ELSE bal END AS bal_d
       |  FROM clean),
       |cand AS MATERIALIZED (
       |  SELECT d.key AS d_id, c.key AS cand_key
       |  FROM dirty d JOIN clean c ON d.name_d = c.name
       |  UNION
       |  SELECT d.key, c.key
       |  FROM dirty d JOIN clean c
       |    ON d.nation_d = c.nation AND d.seg_d = c.seg),
       |stats AS MATERIALIZED (
       |  SELECT (SELECT COUNT(*) FROM clean) AS n,
       |    (SELECT SUM(CAST(cnt AS HUGEINT) * cnt) FROM
       |      (SELECT COUNT(*) AS cnt FROM clean GROUP BY name)) AS s2_name,
       |    (SELECT SUM(CAST(cnt AS HUGEINT) * cnt) FROM
       |      (SELECT COUNT(*) AS cnt FROM clean GROUP BY nation))
       |      AS s2_nation,
       |    (SELECT SUM(CAST(cnt AS HUGEINT) * cnt) FROM
       |      (SELECT COUNT(*) AS cnt FROM clean GROUP BY seg)) AS s2_seg,
       |    (SELECT SUM(CAST(cnt AS HUGEINT) * cnt) FROM
       |      (SELECT COUNT(*) AS cnt FROM clean GROUP BY bal)) AS s2_bal),
       |wt AS MATERIALIZED (
       |  SELECT ${w("name", mName, mdName)},
       |    ${w("nation", mNation, mdNation)},
       |    ${w("seg", mSeg, mdSeg)},
       |    ${w("bal", mBal, mdBal)}
       |  FROM stats),
       |scored AS MATERIALIZED (
       |  SELECT d_id, cand_key, g_name, g_nation, g_seg, g_bal,
       |    g_name * wa_name + (1 - g_name) * wd_name
       |      + g_nation * wa_nation + (1 - g_nation) * wd_nation
       |      + g_seg * wa_seg + (1 - g_seg) * wd_seg
       |      + g_bal * wa_bal + (1 - g_bal) * wd_bal AS score_micro,
       |    CAST(d_id = cand_key AS INTEGER) AS is_true
       |  FROM (
       |    SELECT cand.d_id, cand.cand_key,
       |      CAST(d.name_d = c.name AS INTEGER) AS g_name,
       |      CAST(d.nation_d = c.nation AS INTEGER) AS g_nation,
       |      CAST(d.seg_d = c.seg AS INTEGER) AS g_seg,
       |      CAST(d.bal_d = c.bal AS INTEGER) AS g_bal
       |    FROM cand
       |    JOIN dirty d ON cand.d_id = d.key
       |    JOIN clean c ON cand.cand_key = c.key), wt),
       |decided AS MATERIALIZED (
       |  SELECT d_id, cand_key, g_name, g_nation, g_seg, g_bal,
       |    CAST(score_micro AS BIGINT) AS score_micro,
       |    CASE WHEN score_micro >= $upperMicro THEN 'match'
       |      WHEN score_micro < 0 THEN 'non_match'
       |      ELSE 'possible' END AS decision,
       |    is_true
       |  FROM scored)""".stripMargin
  }

  val qRecordLinkageSql: String =
    s"""WITH $pairCtes
       |SELECT * FROM decided""".stripMargin

  val qLinkageEvalSql: String =
    s"""WITH $pairCtes,
       |agg AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |    CAST(SUM(is_true) AS BIGINT) AS blocking_found,
       |    CAST(SUM(CASE WHEN decision = 'match' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_matches,
       |    CAST(SUM(CASE WHEN decision = 'match' AND is_true = 1
       |      THEN 1 ELSE 0 END) AS BIGINT) AS tp
       |  FROM decided)
       |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM clean) AS n_records,
       |  n_pairs, blocking_found, n_matches, tp,
       |  CASE WHEN n_matches = 0 THEN 0 ELSE
       |    CAST(round(1000000.0 * tp / n_matches) AS BIGINT) END
       |    AS precision_micro,
       |  CAST(round(1000000.0 * tp
       |    / (SELECT COUNT(*) FROM clean)) AS BIGINT) AS recall_micro,
       |  CAST(round(1000000.0 * blocking_found
       |    / (SELECT COUNT(*) FROM clean)) AS BIGINT)
       |    AS blocking_recall_micro
       |FROM agg""".stripMargin
}
