package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** K-ANONYMITY / L-DIVERSITY PROFILE (Sweeney 2002; Machanavajjhala
  * et al. 2007) — the privacy-risk measurement a dataset release (or a
  * training-corpus card, [[graft.ext.TextOps.qDatasetCard]]'s missing
  * privacy row) runs before publishing: group the table by its
  * QUASI-IDENTIFIER columns (the combination an adversary can link
  * from the outside) and report, per k threshold, how much of the
  * population sits in equivalence classes smaller than k — those rows
  * are re-identifiable at confidence ≥ 1/k. l-diversity tightens it:
  * a class where every member shares one SENSITIVE value leaks the
  * attribute even when k is large, so the profile also reports the
  * class-level distinct-sensitive-value floor.
  *
  * Instantiation: customers keyed by the (c_nationkey, c_mktsegment)
  * quasi-identifier with c_acctbal's sign+magnitude band as the
  * sensitive attribute — the classic (zip, demographic) → salary
  * shape mapped onto the TPC-H roles.
  *
  * Output, one row per k ∈ {2, 5, 10, 25}:
  * (k, n_classes, n_rows, risk_classes, risk_rows, risk_share,
  *  min_class_size, min_l) — risk_* = classes/rows with class size
  * < k; min_l = the smallest per-class distinct sensitive count
  * (k-independent, repeated per row for a single self-describing
  * table).
  *
  * Scale shape: ONE groupBy over the quasi-identifier (the only
  * corpus-sized shuffle; count + distinct-sensitive per class ride
  * the same partial agg), then every k threshold is a conditional
  * aggregate over the |classes| count table — the
  * [[DataQuality.qSkewProfile]] posture. Exact integer counts; the
  * one double (risk_share) is a single division of exact longs. */
object Anonymity {

  val kThresholds: Seq[Int] = Seq(2, 5, 10, 25)

  /** Core over any frame: `qi` = quasi-identifier columns, `sensitive`
    * = the attribute l-diversity protects. */
  def kAnonymityProfile(df: DataFrame, qi: Seq[String],
                        sensitive: String): DataFrame = {
    val classes = df.groupBy(qi.map(col): _*)
      .agg(count(lit(1)).as("sz"),
        countDistinct(col(sensitive)).as("l"))
    val spark = df.sparkSession
    import spark.implicits._
    val ks = kThresholds.toDF("k")
    // |classes| × |k| — both bounded; the corpus is long gone
    classes.crossJoin(broadcast(ks))
      .groupBy("k")
      .agg(count(lit(1)).as("n_classes"),
        sum(col("sz")).as("n_rows"),
        sum(when(col("sz") < col("k"), 1L).otherwise(0L))
          .as("risk_classes"),
        sum(when(col("sz") < col("k"), col("sz")).otherwise(0L))
          .as("risk_rows"),
        min(col("sz")).as("min_class_size"),
        min(col("l")).as("min_l"))
      .withColumn("risk_share",
        col("risk_rows").cast(DoubleType) / col("n_rows").cast(DoubleType))
      .select(col("k"), col("n_classes"), col("n_rows"),
        col("risk_classes"), col("risk_rows"), col("risk_share"),
        col("min_class_size"), col("min_l"))
  }

  /** Driver query: the customer table under the
    * (c_nationkey, c_mktsegment) quasi-identifier with the banded
    * account balance (sign + 1000-wide magnitude bucket) sensitive. */
  def qKAnonymity(spark: SparkSession, dir: String): DataFrame =
    kAnonymityProfile(
      Tables(spark, dir, "customer")
        .withColumn("bal_band",
          (floor(col("c_acctbal") / 1000.0)).cast(LongType)),
      Seq("c_nationkey", "c_mktsegment"), "bal_band")

  // ---------------------------------------------------------------
  // GENERALIZATION LADDER — the mitigation the k-anonymity profile
  // was missing: per-class local recoding up a fixed generalization
  // hierarchy until every published class reaches the target k.
  // ---------------------------------------------------------------

  /** Target class size for [[qKGeneralize]]. */
  val kTarget = 10

  /** Generalize the (nation, segment, balance-band) quasi-identifier
    * up a 5-level ladder until every class reaches `k` (Samarati/
    * Sweeney full-domain generalization, applied as LOCAL recoding —
    * each level-ℓ class keeps the finest key that made it big enough,
    * instead of dragging the whole table to the worst class's level):
    *
    *   L0 (N‹nat›, seg, B‹band›) → L1 (R‹region›, seg, B‹band›)
    *   → L2 (R‹region›, seg, *) → L3 (R‹region›, *, *) → L4 (*, *, *)
    *
    * A class is finalized at the FIRST level where the rows still
    * unfinalized in its generalized key sum to ≥ k — so level-ℓ class
    * sizes count only level-(ℓ-1) leftovers, the cascade semantics.
    * L4 is full suppression: its key carries zero quasi-identifier
    * bits, so it is published at any size (the ≥k guarantee binds
    * levels 0–3, spec-proven).
    *
    * Output: the anonymized CLASS table (level, g_nation, g_segment,
    * g_band, class_size) — the utility ledger is the level column
    * itself (0 = no loss … 4 = fully suppressed), so information loss
    * is Σ level·class_size / Σ class_size, derivable exactly.
    *
    * Scale shape: ONE corpus shuffle (the level-0 groupBy; the
    * nation dim joins broadcast before it); the entire cascade is
    * four windowed sums + CASEs over the |classes| table — the
    * [[kAnonymityProfile]] posture extended with bounded windows. */
  def generalizeLadder(customer: DataFrame, nation: DataFrame,
                       k: Int = kTarget): DataFrame = {
    val base = customer.join(
        broadcast(nation.select(col("n_nationkey"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(
        concat(lit("N"), col("c_nationkey").cast(StringType)).as("g0"),
        concat(lit("R"), col("n_regionkey").cast(StringType)).as("g1"),
        col("c_mktsegment").as("seg"),
        concat(lit("B"), floor(col("c_acctbal") / 1000.0)
          .cast(LongType).cast(StringType)).as("band"))
    val cls = base.groupBy("g0", "g1", "seg", "band")
      .agg(count(lit(1)).as("sz"))
    // the cascade: windowed leftover sums over the bounded class table
    val w1 = Window.partitionBy("g1", "seg", "band")
    val w2 = Window.partitionBy("g1", "seg")
    val w3 = Window.partitionBy("g1")
    val leveled = cls
      .withColumn("ok0", col("sz") >= k)
      .withColumn("ok1", !col("ok0") &&
        sum(when(col("ok0"), 0L).otherwise(col("sz"))).over(w1) >= k)
      .withColumn("ok2", !col("ok0") && !col("ok1") &&
        sum(when(col("ok0") || col("ok1"), 0L).otherwise(col("sz")))
          .over(w2) >= k)
      .withColumn("ok3", !col("ok0") && !col("ok1") && !col("ok2") &&
        sum(when(col("ok0") || col("ok1") || col("ok2"), 0L)
          .otherwise(col("sz"))).over(w3) >= k)
      .withColumn("level",
        when(col("ok0"), lit(0)).when(col("ok1"), lit(1))
          .when(col("ok2"), lit(2)).when(col("ok3"), lit(3))
          .otherwise(lit(4)))
    leveled.select(col("level"),
        when(col("level") === 0, col("g0"))
          .when(col("level") <= 3, col("g1")).otherwise(lit("*"))
          .as("g_nation"),
        when(col("level") <= 2, col("seg")).otherwise(lit("*"))
          .as("g_segment"),
        when(col("level") <= 1, col("band")).otherwise(lit("*"))
          .as("g_band"),
        col("sz"))
      .groupBy("level", "g_nation", "g_segment", "g_band")
      .agg(sum(col("sz")).as("class_size"))
  }

  /** Driver query: the anonymized class table at k = [[kTarget]]. */
  def qKGeneralize(spark: SparkSession, dir: String): DataFrame =
    generalizeLadder(Tables(spark, dir, "customer"),
      Tables(spark, dir, "nation"))

  val qKGeneralizeSql: String = {
    val k = kTarget
    s"""WITH base AS MATERIALIZED (
      |  SELECT 'N' || CAST(c_nationkey AS VARCHAR) AS g0,
      |    'R' || CAST(n_regionkey AS VARCHAR) AS g1,
      |    c_mktsegment AS seg,
      |    'B' || CAST(CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS VARCHAR)
      |      AS band
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
      |cls AS MATERIALIZED (
      |  SELECT g0, g1, seg, band, CAST(COUNT(*) AS BIGINT) AS sz
      |  FROM base GROUP BY 1, 2, 3, 4),
      |s0 AS MATERIALIZED (SELECT *, sz >= $k AS ok0 FROM cls),
      |s1 AS MATERIALIZED (
      |  SELECT *, NOT ok0 AND
      |    SUM(CASE WHEN ok0 THEN 0 ELSE sz END)
      |      OVER (PARTITION BY g1, seg, band) >= $k AS ok1
      |  FROM s0),
      |s2 AS MATERIALIZED (
      |  SELECT *, NOT ok0 AND NOT ok1 AND
      |    SUM(CASE WHEN ok0 OR ok1 THEN 0 ELSE sz END)
      |      OVER (PARTITION BY g1, seg) >= $k AS ok2
      |  FROM s1),
      |s3 AS MATERIALIZED (
      |  SELECT *, NOT ok0 AND NOT ok1 AND NOT ok2 AND
      |    SUM(CASE WHEN ok0 OR ok1 OR ok2 THEN 0 ELSE sz END)
      |      OVER (PARTITION BY g1) >= $k AS ok3
      |  FROM s2),
      |fin AS (
      |  SELECT CASE WHEN ok0 THEN 0 WHEN ok1 THEN 1 WHEN ok2 THEN 2
      |    WHEN ok3 THEN 3 ELSE 4 END AS level, g0, g1, seg, band, sz
      |  FROM s3)
      |SELECT level,
      |  CASE WHEN level = 0 THEN g0 WHEN level <= 3 THEN g1
      |    ELSE '*' END AS g_nation,
      |  CASE WHEN level <= 2 THEN seg ELSE '*' END AS g_segment,
      |  CASE WHEN level <= 1 THEN band ELSE '*' END AS g_band,
      |  CAST(SUM(sz) AS BIGINT) AS class_size
      |FROM fin GROUP BY 1, 2, 3, 4""".stripMargin
  }

  val qKAnonymitySql: String = {
    val ks = kThresholds.mkString(", ")
    s"""WITH classes AS MATERIALIZED (
      |  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS sz,
      |    CAST(COUNT(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT))
      |      AS BIGINT) AS l
      |  FROM customer GROUP BY 1, 2),
      |ks AS (SELECT unnest([$ks]) AS k)
      |SELECT CAST(k AS INTEGER) AS k,
      |  CAST(COUNT(*) AS BIGINT) AS n_classes,
      |  CAST(SUM(sz) AS BIGINT) AS n_rows,
      |  CAST(SUM(CASE WHEN sz < k THEN 1 ELSE 0 END) AS BIGINT)
      |    AS risk_classes,
      |  CAST(SUM(CASE WHEN sz < k THEN sz ELSE 0 END) AS BIGINT)
      |    AS risk_rows,
      |  CAST(SUM(CASE WHEN sz < k THEN sz ELSE 0 END) AS DOUBLE)
      |    / CAST(SUM(sz) AS DOUBLE) AS risk_share,
      |  CAST(MIN(sz) AS BIGINT) AS min_class_size,
      |  CAST(MIN(l) AS BIGINT) AS min_l
      |FROM classes CROSS JOIN ks
      |GROUP BY 1""".stripMargin
  }

  // ---------------------------------------------------------------
  // T-CLOSENESS — the third rung of the release-privacy ladder
  // (k-anonymity → l-diversity → t-closeness; Li, Li &
  // Venkatasubramanian 2007): a class can be large (k ok) and
  // diverse (l ok) yet still leak — if its sensitive DISTRIBUTION
  // differs sharply from the global one, membership alone updates an
  // adversary's belief. t is the Earth Mover's Distance between the
  // class and global sensitive distributions; for a 1-D ordered
  // attribute with m equally-spaced values,
  //   EMD = Σᵢ₌₁^{m−1} |Σ_{j≤i}(p_j − q_j)| / (m − 1),
  // held EXACT as cross-multiplied integers: the inner cumulative is
  // r_i = Σ_{j≤i} (cnt_class_j·n − cnt_glob_j·sz) and
  //   t_micro = 10⁶·Σ|r_i| div (sz·n·(m−1))
  // (Θ(n²) masses → DECIMAL(38,0)/HUGEINT before the collapsing
  // division). One corpus shuffle builds the (class, band) histogram;
  // the dense grid, cumulative sweep and EMD are over the bounded
  // |classes|×|bands| table.
  // ---------------------------------------------------------------

  /** Per-class t table over any frame: `qi` the quasi-identifier,
    * `sensitive` an ORDERED (numeric) attribute. */
  def tClosenessProfile(df: DataFrame, qi: Seq[String],
                        sensitive: String): DataFrame = {
    val qc = qi.map(col)
    // the (class, band) histogram feeds FOUR legs (class sizes, global
    // band counts, totals, and the dense-grid join) — materialize the
    // bounded table once so the corpus is scanned once, not four times
    // (plan-asserted in PlanAuditR14Spec)
    val (cc, _) = graft.util.Checkpoints.checkpointTracked(
      df.groupBy(qc :+ col(sensitive): _*)
        .agg(count(lit(1)).as("cc")))
    val cls = cc.groupBy(qc: _*).agg(sum("cc").as("sz"))
    val g = cc.groupBy(col(sensitive)).agg(sum("cc").as("gc"))
    val tot = g.agg(sum("gc").as("n"), count(lit(1)).as("m"))
    val grid = cls.crossJoin(broadcast(g))
      .join(cc, qi :+ sensitive, "left")
      .na.fill(0L, Seq("cc"))
      .crossJoin(broadcast(tot))
    val w = Window.partitionBy(qc: _*)
      .orderBy(col(sensitive).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.withColumn("r", sum(col("cc") * col("n") - col("gc") * col("sz"))
        .over(w))
      .groupBy(qc :+ col("sz").as("sz") :+ col("n").as("n")
        :+ col("m").as("m"): _*)
      .agg(sum(abs(col("r"))).as("sabs"))
      .select(qc :+ col("sz") :+
        expr("""case when m <= 1 then 0L else cast(
                | (cast(sabs as decimal(38,0)) * 1000000L)
                |   div (cast(sz as decimal(38,0)) * n * (m - 1))
                | as bigint) end""".stripMargin.replace("\n", " "))
          .as("t_micro"): _*)
      .orderBy(qc: _*)
  }

  /** Driver query: same instantiation as [[qKAnonymity]] — the
    * (nation, segment) quasi-identifier against the banded balance. */
  def qTCloseness(spark: SparkSession, dir: String): DataFrame =
    tClosenessProfile(
      Tables(spark, dir, "customer")
        .withColumn("bal_band",
          (floor(col("c_acctbal") / 1000.0)).cast(LongType)),
      Seq("c_nationkey", "c_mktsegment"), "bal_band")

  val qTClosenessSql: String =
    """WITH cc AS MATERIALIZED (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
      |    CAST(COUNT(*) AS BIGINT) AS cc
      |  FROM customer GROUP BY 1, 2, 3),
      |cls AS (SELECT c_nationkey, c_mktsegment,
      |    CAST(SUM(cc) AS BIGINT) AS sz
      |  FROM cc GROUP BY 1, 2),
      |g AS (SELECT bal_band, CAST(SUM(cc) AS BIGINT) AS gc
      |  FROM cc GROUP BY 1),
      |tot AS (SELECT CAST(SUM(gc) AS BIGINT) AS n,
      |    CAST(COUNT(*) AS BIGINT) AS m FROM g),
      |grid AS (
      |  SELECT cls.c_nationkey, cls.c_mktsegment, cls.sz,
      |    g.bal_band, g.gc, COALESCE(cc.cc, 0) AS cc, tot.n, tot.m
      |  FROM cls CROSS JOIN g CROSS JOIN tot
      |  LEFT JOIN cc ON cc.c_nationkey = cls.c_nationkey
      |    AND cc.c_mktsegment = cls.c_mktsegment
      |    AND cc.bal_band = g.bal_band),
      |r AS (
      |  SELECT c_nationkey, c_mktsegment, sz, n, m,
      |    SUM(cc * n - gc * sz) OVER (
      |      PARTITION BY c_nationkey, c_mktsegment
      |      ORDER BY bal_band ROWS UNBOUNDED PRECEDING) AS r
      |  FROM grid)
      |SELECT c_nationkey, c_mktsegment, sz,
      |  CASE WHEN m <= 1 THEN 0 ELSE CAST(
      |    (CAST(SUM(ABS(r)) AS HUGEINT) * 1000000)
      |      // (CAST(sz AS HUGEINT) * n * (m - 1)) AS BIGINT) END
      |    AS t_micro
      |FROM r GROUP BY c_nationkey, c_mktsegment, sz, n, m
      |ORDER BY c_nationkey, c_mktsegment""".stripMargin

  // ---------------------------------------------------------------
  // ENTROPY ℓ-DIVERSITY (Machanavajjhala et al. 2007 §3.2) — the
  // middle rung the ladder's profile reported only as a distinct
  // count: a class whose sensitive values are 99% one value and 1%
  // spread passes distinct-ℓ but leaks; entropy ℓ-diversity demands
  //   −Σ p_v ln p_v ≥ ln ℓ   per class,
  // i.e. effective ℓ = exp(entropy) — the "how many values is the
  // class REALLY spread over" number.
  // ---------------------------------------------------------------

  /** Per-class diversity table over any frame: (qi…, sz, distinct_l,
    * entropy_micro, eff_l_micro). Each class's entropy is a sum of
    * per-(class, value) micronat-quantized terms
    * round(1e6·(cnt/sz)·ln(sz/cnt)) — integer, order-portable (the
    * [[KaplanMeier]] convention); eff_l is one exp of the integer.
    *
    * Scale: ONE corpus shuffle to the (class, value) histogram (the
    * [[tClosenessProfile]] cc table); both aggregations after are
    * grid-sized. */
  def lDiversityProfile(df: DataFrame, qi: Seq[String],
                        sensitive: String): DataFrame = {
    val qc = qi.map(col)
    // the (class, value) histogram feeds the class rollup AND the
    // term join — materialize once (the tClosenessProfile posture)
    val (cc, _) = graft.util.Checkpoints.checkpointTracked(
      df.groupBy(qc :+ col(sensitive): _*)
        .agg(count(lit(1)).as("cc")))
    val cls = cc.groupBy(qc: _*)
      .agg(sum("cc").as("sz"), count(lit(1)).as("distinct_l"))
    cc.join(cls, qi)
      .withColumn("term",
        expr("""cast(round(1000000.0 * cast(cc as double) / sz
               | * ln(cast(sz as double) / cc)) as bigint)"""
          .stripMargin.replace("\n", " ")))
      .groupBy(qc :+ col("sz") :+ col("distinct_l"): _*)
      .agg(sum(col("term")).as("entropy_micro"))
      .withColumn("eff_l_micro",
        expr("cast(round(1000000.0 * exp(entropy_micro / 1000000.0))"
          + " as bigint)"))
      .select(qc :+ col("sz") :+ col("distinct_l")
        :+ col("entropy_micro") :+ col("eff_l_micro"): _*)
      .orderBy(qc: _*)
  }

  /** Driver query: same instantiation as [[qKAnonymity]]. */
  def qLDiversity(spark: SparkSession, dir: String): DataFrame =
    lDiversityProfile(
      Tables(spark, dir, "customer")
        .withColumn("bal_band",
          (floor(col("c_acctbal") / 1000.0)).cast(LongType)),
      Seq("c_nationkey", "c_mktsegment"), "bal_band")

  val qLDiversitySql: String =
    """WITH cc AS MATERIALIZED (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
      |    CAST(COUNT(*) AS BIGINT) AS cc
      |  FROM customer GROUP BY 1, 2, 3),
      |cls AS (SELECT c_nationkey, c_mktsegment,
      |    CAST(SUM(cc) AS BIGINT) AS sz,
      |    CAST(COUNT(*) AS BIGINT) AS distinct_l
      |  FROM cc GROUP BY 1, 2),
      |terms AS (
      |  SELECT cc.c_nationkey, cc.c_mktsegment, cls.sz, cls.distinct_l,
      |    CAST(ROUND(1000000.0 * CAST(cc.cc AS DOUBLE) / cls.sz
      |      * ln(CAST(cls.sz AS DOUBLE) / cc.cc)) AS BIGINT) AS term
      |  FROM cc JOIN cls ON cc.c_nationkey = cls.c_nationkey
      |    AND cc.c_mktsegment = cls.c_mktsegment)
      |SELECT c_nationkey, c_mktsegment, sz, distinct_l,
      |  CAST(SUM(term) AS BIGINT) AS entropy_micro,
      |  CAST(ROUND(1000000.0 * exp(CAST(SUM(term) AS DOUBLE) / 1000000.0))
      |    AS BIGINT) AS eff_l_micro
      |FROM terms GROUP BY 1, 2, 3, 4
      |ORDER BY c_nationkey, c_mktsegment""".stripMargin
}
