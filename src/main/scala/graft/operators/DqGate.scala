package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** CLOSED-LOOP DATA-QUALITY GATING — the consumer the
  * [[DataQuality.qDqRules]] report was missing: the same rule
  * predicates applied PER ROW, splitting the fact stream into a clean
  * flow and a quarantine flow so downstream views compute over
  * verified rows only (the reference's dead-letter posture —
  * `config.py:223-234` moves unparseable FILES aside; this is the
  * row-granular analog for semantically bad ROWS), plus the automatic
  * salting decision that closes the [[DataQuality.qSkewProfile]] loop.
  *
  * Rule set = the row-attributable subset of qDqRules (range, domain,
  * positivity-by-proxy, cross-table temporal order, referential
  * integrity). Aggregate-only rules (key uniqueness) can't indict a
  * single row and stay report-only.
  *
  * Plan shape: ONE left join against the ≤|orders| (key, date) side —
  * the same join the temporal rule needs anyway — then every verdict
  * is a codegen'd CASE over the joined row; the rule-name array is
  * assembled and filtered in the same projection. Clean/quarantine
  * split is two filters over one computed column — at 100 TB both
  * flows stream map-side off the same scan, no second pass. */
object DqGate {

  /** (rule name, per-row pass predicate) — evaluated on the lineitem ⟕
    * orders(key, date) frame. Fixed declaration order = the order rule
    * names appear in `viol_rules`. */
  private def rowRules: Seq[(String, Column)] = Seq(
    "l_quantity_in_1_50" ->
      (col("l_quantity") >= 1.0 && col("l_quantity") <= 50.0),
    "l_returnflag_domain" -> col("l_returnflag").isin("A", "N", "R"),
    "l_discount_in_0_1" ->
      (col("l_discount") >= 0.0 && col("l_discount") <= 1.0),
    // temporal order needs the order date; an orphan (no orders row)
    // fails the RI rule below instead, so the NULL date passes here
    "l_ship_after_order" ->
      (col("o_orderdate").isNull || col("l_shipdate") >= col("o_orderdate")),
    "l_orderkey_in_orders" -> col("o_orderdate").isNotNull)

  /** lineitem + `viol_rules array<string>` (empty = clean row). */
  def flagged(li: DataFrame, orders: DataFrame): DataFrame = {
    val joined = li.join(
      orders.select(col("o_orderkey"), col("o_orderdate")),
      col("l_orderkey") === col("o_orderkey"), "left")
    joined.withColumn("viol_rules",
        filter(array(rowRules.map { case (name, pass) =>
          when(pass, lit(null).cast(StringType)).otherwise(lit(name))
        }: _*), x => x.isNotNull))
      .drop("o_orderkey", "o_orderdate")
  }

  /** The quarantine flow: rows violating ≥1 row-level rule. */
  def quarantined(li: DataFrame, orders: DataFrame): DataFrame =
    flagged(li, orders).filter(size(col("viol_rules")) > 0)

  /** The clean flow: the EXACT complement — downstream views read this
    * instead of the raw fact table once the gate is wired in. */
  def cleanRows(li: DataFrame, orders: DataFrame): DataFrame =
    flagged(li, orders).filter(size(col("viol_rules")) === 0)
      .drop("viol_rules")

  /** Driver query: the quarantine view — every quarantined row's key,
    * line number, and its violated rules as a comma-joined string in
    * rule-declaration order (engine-portable rendering of the array). */
  def qDqQuarantine(spark: SparkSession, dir: String): DataFrame =
    quarantined(Tables(spark, dir, "lineitem"),
        Tables(spark, dir, "orders"))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"), col("l_quantity"),
        array_join(col("viol_rules"), ",").as("viol_rules"))

  val qDqQuarantineSql: String =
    """WITH f AS (
      |  SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate, l.l_quantity,
      |    list_filter([
      |      CASE WHEN l.l_quantity >= 1.0 AND l.l_quantity <= 50.0
      |        THEN NULL ELSE 'l_quantity_in_1_50' END,
      |      CASE WHEN l.l_returnflag IN ('A', 'N', 'R')
      |        THEN NULL ELSE 'l_returnflag_domain' END,
      |      CASE WHEN l.l_discount >= 0.0 AND l.l_discount <= 1.0
      |        THEN NULL ELSE 'l_discount_in_0_1' END,
      |      CASE WHEN o.o_orderdate IS NULL
      |             OR l.l_shipdate >= o.o_orderdate
      |        THEN NULL ELSE 'l_ship_after_order' END,
      |      CASE WHEN o.o_orderdate IS NOT NULL
      |        THEN NULL ELSE 'l_orderkey_in_orders' END],
      |      x -> x IS NOT NULL) AS vr
      |  FROM lineitem l
      |  LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey)
      |SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity,
      |  list_aggregate(vr, 'string_agg', ',') AS viol_rules
      |FROM f WHERE len(vr) > 0""".stripMargin

  /** STREAMING QUARANTINE STAGE — the ST5/S8 dead-letter machinery at
    * row granularity: each micro-batch splits through [[flagged]]; the
    * violating rows land in `quarantineDir/batch=<id>` (with their
    * viol_rules), the clean complement in `cleanDir/batch=<id>` — the
    * per-batch-dir overwrite layout ([[graft.streaming.ProfileStore]]
    * posture), so a replayed batch overwrites its own delta and the
    * stores stay exactly-once under redelivery. Downstream views read
    * the CLEAN store and therefore never see a quarantined row
    * (spec-proven); quarantine is a TABLE, so each row keeps its
    * indictment for triage — richer than the file-level dead-letter,
    * which can only move a whole file aside. */
  def gateBatch(batch: DataFrame, orders: DataFrame, cleanDir: String,
                quarantineDir: String, batchId: Long): Unit = {
    // releasable checkpoint (a raw localCheckpoint would pin one dead
    // cached RDD per micro-batch for the session lifetime)
    val (f, release) = graft.util.Checkpoints.checkpointTracked(
      flagged(batch, orders))
    try {
      f.filter(size(col("viol_rules")) > 0)
        .withColumn("viol_rules", array_join(col("viol_rules"), ","))
        .write.mode("overwrite").parquet(s"$quarantineDir/batch=$batchId")
      f.filter(size(col("viol_rules")) === 0).drop("viol_rules")
        .write.mode("overwrite").parquet(s"$cleanDir/batch=$batchId")
    } finally release()
  }

  // ---------------------------------------------------------------
  // AUTO-SALT: the skew profile's Herfindahl output driving the
  // explicit-salting decision ([[Salting.saltedJoin]]) automatically.
  // ---------------------------------------------------------------

  /** Per-key statistics of `fact(keyCol)` in [[DataQuality
    * .qSkewProfile]]'s shape, reduced to the salting decision inputs.
    * One partial-agg pass over the fact + a bounded agg over the
    * |keys| count table — at 100 TB a deployment would serve this from
    * the standing skew-profile job instead of recomputing. */
  final case class SkewStats(nKeys: Long, nRows: Long, maxCnt: Long,
                             hhi: Double)

  def skewStats(fact: DataFrame, keyCol: String): SkewStats = {
    val r = fact.groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
        max(col("c")).as("max_cnt"),
        sum(col("c").cast(DecimalType(38, 0)) * col("c")).as("sum_c2"))
      .head()
    val nRows = r.getAs[Long]("n_rows")
    SkewStats(r.getAs[Long]("n_keys"), nRows, r.getAs[Long]("max_cnt"),
      r.getAs[java.math.BigDecimal]("sum_c2").doubleValue() /
        (nRows.toDouble * nRows.toDouble))
  }

  /** Decide the salt fan-out for joining on this key: 0 = plain join.
    * Trigger: the hottest key exceeds `skewFactor`× the average
    * per-partition row share (the same imbalance AQE's skew split
    * keys on) — then salt by the hot key's multiple of the fair
    * share, capped. A near-uniform key (hhi ≈ 1/n_keys) never
    * triggers. */
  def saltsFor(stats: SkewStats, partitions: Int,
               skewFactor: Double = 4.0, maxSalts: Int = 64): Int = {
    val fairShare = stats.nRows.toDouble / partitions.toDouble
    if (stats.maxCnt.toDouble <= skewFactor * fairShare) 0
    else math.min(maxSalts,
      math.max(2, math.ceil(stats.maxCnt.toDouble / fairShare).toInt))
  }

  /** The closed loop: [[JoinAdvisor.adviseJoin]] measures one shared
    * per-key count pass and its strategy drives the physical join
    * end-to-end — `broadcast` hints the build side (a
    * BroadcastHashJoin, no fact shuffle at all), `salt` spreads the
    * hot key ([[Salting.saltedJoin]] with the fan-out from the same
    * measured stats), `shuffle` is the plain sort-merge/hash path.
    * Semantics identical to the plain join in all three arms
    * (spec-proven); only the physical distribution changes. */
  def joinWithSkewGuard(fact: DataFrame, dim: DataFrame, factKey: String,
                        dimKey: String, joinType: String = "inner",
                        numPartitions: Int = 0,
                        broadcastBudget: Long = JoinAdvisor.broadcastRows)
      : DataFrame = {
    val partitions =
      if (numPartitions > 0) numPartitions
      else fact.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val adv = JoinAdvisor.adviseJoin(fact, factKey, dim, dimKey,
      broadcastBudget)
    adv.strategy match {
      case "broadcast" =>
        fact.join(broadcast(dim), fact(factKey) === dim(dimKey), joinType)
      case "salt" =>
        // fan-out from the fact-side stats measured in the SAME pass;
        // the advisor can flag output-share skew the fact-only test
        // misses (hot key amplified by dim multiplicity) — floor at 2
        Salting.saltedJoin(fact, dim, factKey, dimKey,
          math.max(2, saltsFor(adv.factStats, partitions)), joinType)
      case _ =>
        fact.join(dim, fact(factKey) === dim(dimKey), joinType)
    }
  }
}
