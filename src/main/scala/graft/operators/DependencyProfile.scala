package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** DEPENDENCY PROFILING — approximate FUNCTIONAL dependencies
  * (Kivinen & Mannila 1995's g₃ error; the TANE family, Huhtala et
  * al. 1999) and INCLUSION dependencies (the SPIDER/BINDER join-key
  * discovery problem, Bauckmann et al. 2007; Papenbrock et al. 2015)
  * — the two schema-structure measurements a data platform runs over
  * an unfamiliar 100 TB drop before anyone writes a join: which
  * columns determine which (candidate keys, denormalization checks),
  * and which columns embed in which (foreign-key discovery).
  *
  * FD leg: for each declared candidate X → A, the g₃ error is the
  * minimum fraction of rows to delete for the FD to hold exactly —
  *   g₃ = (n − Σ_x max_a count(x, a)) / n,
  * exact integer counts, micro-quantized by one integer division.
  * The candidate battery rides ONE corpus scan: each row explodes to
  * |P| (dep, lhs, rhs) triples (bounded fan-out), one partial-agg
  * shuffle collapses to the (dep, lhs, rhs) histogram, and the max/sum
  * sweep is over the histogram, never the corpus. Composite LHS is
  * the NUL-joined string key (null marked, injective).
  *
  * IND leg: for each candidate child ⊆ parent, containment =
  * |distinct(child) ∩ parent| / |distinct(child)| — distinct-project
  * both sides (the only shuffles, keyed on the value), one left join,
  * exact counts. `holds` at 10⁶ micro = a foreign key the optimizer
  * ([[JoinAdvisor]]) can trust.
  *
  * Both legs hold at scale: histogram/distinct cardinality bounds the
  * state, the corpus is touched once per leg, and no driver loop
  * iterates over data — candidates are schema-sized, not data-sized.
  */
object DependencyProfile {

  /** FD candidates over orders: the primary key (exact by
    * construction), a composite near-key, and three value
    * dependencies of varying strength — the profile MEASURES, the
    * data decides. */
  val fdCandidates: Seq[(String, Seq[String], String)] = Seq(
    ("orderkey->custkey", Seq("o_orderkey"), "o_custkey"),
    ("custkey,orderdate->orderkey",
      Seq("o_custkey", "o_orderdate"), "o_orderkey"),
    ("custkey->orderstatus", Seq("o_custkey"), "o_orderstatus"),
    ("orderpriority->orderstatus",
      Seq("o_orderpriority"), "o_orderstatus"),
    ("orderdate->orderpriority", Seq("o_orderdate"), "o_orderpriority"))

  /** Null-marked injective string key (concat_ws drops nulls, which
    * would conflate NULL with ''). */
  private def keyOf(cols: Seq[String]): Column =
    concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)

  /** g₃ profile of `cands` over one frame — one scan, |cands|-way
    * explode, one histogram shuffle. */
  def fdProfile(df: DataFrame,
                cands: Seq[(String, Seq[String], String)]): DataFrame = {
    val triples = df.select(explode(array(cands.map { case (nm, lhs, rhs) =>
        struct(lit(nm).as("dep"), keyOf(lhs).as("lhs"),
          keyOf(Seq(rhs)).as("rhs"))
      }: _*)).as("t"))
      .select(col("t.dep"), col("t.lhs"), col("t.rhs"))
    triples.groupBy("dep", "lhs", "rhs").agg(count(lit(1)).as("c"))
      .groupBy("dep", "lhs")
      .agg(max("c").as("mx"), sum("c").as("s"), count(lit(1)).as("pairs"))
      .groupBy("dep")
      .agg(sum("s").as("n_rows"), count(lit(1)).as("n_lhs"),
        sum("pairs").as("n_pairs"),
        (sum("s") - sum("mx")).as("violations"))
      .select(col("dep"), col("n_rows"), col("n_lhs"), col("n_pairs"),
        col("violations"),
        expr("(1000000L * violations) div n_rows").as("g3_micro"),
        (col("violations") === 0L).as("holds"))
      .orderBy("dep")
  }

  def qFdDiscover(spark: SparkSession, dir: String): DataFrame =
    fdProfile(Tables(spark, dir, "orders"), fdCandidates)

  val qFdDiscoverSql: String = {
    val branches = fdCandidates.map { case (nm, lhs, rhs) =>
      val lk = lhs.map(c =>
        s"COALESCE(CAST($c AS VARCHAR), chr(0))").mkString(" || chr(1) || ")
      s"""SELECT '$nm' AS dep, $lk AS lhs,
         |  COALESCE(CAST($rhs AS VARCHAR), chr(0)) AS rhs
         |FROM orders""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH triples AS (
       |$branches),
       |hist AS (
       |  SELECT dep, lhs, rhs, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM triples GROUP BY 1, 2, 3),
       |per_lhs AS (
       |  SELECT dep, lhs, MAX(c) AS mx, SUM(c) AS s,
       |    CAST(COUNT(*) AS BIGINT) AS pairs
       |  FROM hist GROUP BY 1, 2)
       |SELECT dep, CAST(SUM(s) AS BIGINT) AS n_rows,
       |  CAST(COUNT(*) AS BIGINT) AS n_lhs,
       |  CAST(SUM(pairs) AS BIGINT) AS n_pairs,
       |  CAST(SUM(s) - SUM(mx) AS BIGINT) AS violations,
       |  (1000000 * CAST(SUM(s) - SUM(mx) AS BIGINT)) // CAST(SUM(s) AS BIGINT)
       |    AS g3_micro,
       |  (SUM(s) - SUM(mx)) = 0 AS holds
       |FROM per_lhs GROUP BY dep ORDER BY dep""".stripMargin
  }

  // ---------------------------------------------------------------
  // INCLUSION DEPENDENCIES
  // ---------------------------------------------------------------

  /** (child table, child col, parent table, parent col): the star
    * schema's four true foreign keys plus one near-miss (customers
    * into the much smaller supplier key space). */
  val indCandidates: Seq[(String, String, String, String)] = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("customer", "c_custkey", "supplier", "s_suppkey"))

  def indProfile(spark: SparkSession, dir: String,
                 cands: Seq[(String, String, String, String)]): DataFrame =
    cands.map { case (ct, cc, pt, pc) =>
      val child = Tables(spark, dir, ct).select(col(cc).as("v"))
        .filter(col("v").isNotNull).distinct()
      val parent = Tables(spark, dir, pt).select(col(pc).as("pv"))
        .filter(col("pv").isNotNull).distinct()
      child.join(parent, col("v") === col("pv"), "left")
        .agg(count(lit(1)).as("n_child"),
          sum(when(col("pv").isNotNull, 1L).otherwise(0L))
            .as("n_contained"))
        .select(lit(s"$ct.$cc").as("child"), lit(s"$pt.$pc").as("parent"),
          col("n_child"), col("n_contained"),
          expr("(1000000L * n_contained) div n_child")
            .as("containment_micro"),
          (col("n_child") === col("n_contained")).as("holds"))
    }.reduce(_.unionAll(_)).orderBy("child", "parent")

  def qInclusionDeps(spark: SparkSession, dir: String): DataFrame =
    indProfile(spark, dir, indCandidates)

  val qInclusionDepsSql: String =
    indCandidates.map { case (ct, cc, pt, pc) =>
      s"""SELECT '$ct.$cc' AS child, '$pt.$pc' AS parent,
         |  n_child, n_contained,
         |  (1000000 * n_contained) // n_child AS containment_micro,
         |  n_child = n_contained AS holds
         |FROM (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_child,
         |    CAST(SUM(CASE WHEN p.pv IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_contained
         |  FROM (SELECT DISTINCT $cc AS v FROM $ct
         |        WHERE $cc IS NOT NULL) c
         |  LEFT JOIN (SELECT DISTINCT $pc AS pv FROM $pt
         |             WHERE $pc IS NOT NULL) p ON c.v = p.pv)""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY child, parent"
}
