package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the cluster
  * step a near-dup pipeline needs AFTER pair mining: Jaccard/MinHash/
  * SimHash emit PAIRS, but "keep one copy per duplicate group" is a
  * property of the transitive closure (a≈b, b≈c ⇒ {a,b,c} is one
  * group even when a and c never formed a pair).
  *
  * Algorithm: alternating large-star / small-star contraction
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC 2014) — converges in O(log² n) rounds on ANY graph, including
  * the long-chain worst case where plain min-label propagation needs
  * diameter rounds. Each round is a constant number of key-partitioned
  * shuffles of the CURRENT edge set (which only shrinks toward the
  * final star forest):
  *
  *   - large-star(u): every neighbor v > u is re-pointed at
  *     m = min(N(u) ∪ {u});
  *   - small-star(u): every neighbor v < u, and u itself, is
  *     re-pointed at m = min({v ∈ N(u) : v < u}).
  *
  * Both are expressed as groupBy(u).min + an equi-join back to the
  * neighbor list on the SAME key u (exchange-reusable) — never
  * collect_list, so a mega-component's hub node costs rows, not one
  * executor's heap. Convergence is detected by the direct star-forest
  * fixpoint test of [[isStarForest]] — one aggregation pass per round,
  * a single boolean to the driver, never rows — so the common
  * one-round near-clique case stops immediately instead of paying an
  * extra round to observe edge-set stability. Each round's edge set is
  * checkpointed via [[graft.util.Checkpoints]] (lineage doubles per
  * iteration otherwise) and the previous round's blocks are released
  * precisely.
  *
  * At 100 TB: the input edge set is the near-dup PAIR set — already
  * bounded linear by the docfreq/bucket caps of the pair miners — and
  * every round's shuffle carries (long, long) rows only. Duplicate
  * clusters are shallow in practice (most are size 2–3), so typical
  * convergence is 2–3 rounds; the log² bound is the adversarial-chain
  * guarantee, not the expected cost.
  */
object ConnectedComponents {

  /** Maximum star rounds before giving up: 32 covers log²(n) for any
    * n ≤ 2⁶⁴ component in theory (empirically star contraction
    * converges far faster; the chain-of-256 spec converges in 5). */
  val maxRounds = 32

  /** (node, component) for every node incident to at least one edge,
    * where component = the minimum node id in its connected component.
    * Input edges are undirected; self loops and duplicates are
    * tolerated (canonicalized away). Isolated nodes are by definition
    * absent from an edge list — callers wanting singleton rows union
    * them in (see [[graft.ext.Dedup.qDupClusters]] which does not:
    * a singleton is trivially its own cluster). */
  def components(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    // canonical (src < dst) long edges, self loops dropped
    val e0 = edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("src"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("dst"))
      .filter(col("src") < col("dst"))
      .distinct()

    var (cur, release) = graft.util.Checkpoints.checkpointTracked(e0)
    var converged = isStarForest(cur)
    var round = 0
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(cur))
      val (nextDf, nextRelease) =
        graft.util.Checkpoints.checkpointTracked(next)
      release()
      cur = nextDf; release = nextRelease
      converged = isStarForest(cur)
      round += 1
    }
    require(converged,
      s"connected components did not converge in $maxRounds rounds")

    // Fixpoint edges are the star forest (node -> component min);
    // roots point to themselves via the dst side.
    val out = cur.select(col("dst").as("node"), col("src").as("component"))
      .union(cur.select(col("src").as("node"), col("src").as("component")))
      .groupBy("node").agg(min(col("component")).as("component"))
    // Detach the result from the iteration's checkpoint blocks so they
    // can be released without invalidating the returned plan.
    val (outDf, _) = graft.util.Checkpoints.checkpointTracked(out)
    release()
    outDf
  }

  /** DIRECT fixpoint test, cheaper than comparing consecutive edge
    * sets (which needs one extra no-op round to observe stability):
    * with canonical (src < dst) orientation, the edge set is a star
    * forest — each component's edges all sharing one src — iff no
    * node is both a src and a dst AND no dst appears twice. Any such
    * forest is THE answer: chains are excluded (a chain's middle node
    * is src and dst), multi-parent nodes are excluded (dst twice),
    * and each star's root is its component's minimum because src < dst
    * holds on every edge. One aggregation pass over the edge set; the
    * common near-clique duplicate graph converges after a single star
    * round and this detects it immediately. */
  private def isStarForest(edges: DataFrame): Boolean = {
    val roles = edges
      .select(col("src").as("n"), lit(1L).as("s"), lit(0L).as("d"))
      .union(edges.select(col("dst").as("n"), lit(0L).as("s"),
        lit(1L).as("d")))
      .groupBy("n").agg(sum(col("s")).as("ns"), sum(col("d")).as("nd"))
    roles.filter(col("nd") > 1 || (col("ns") > 0 && col("nd") > 0))
      .isEmpty
  }

  /** Neighbor list of an undirected edge set: every edge from both
    * endpoints' perspective. */
  private def symmetrized(edges: DataFrame): DataFrame =
    edges.select(col("src").as("u"), col("dst").as("v"))
      .union(edges.select(col("dst").as("u"), col("src").as("v")))

  /** large-star: for each u, point every LARGER neighbor at
    * m = min(N(u) ∪ {u}). Output edges keep canonical (small, large)
    * orientation by construction: m <= u < v. */
  private def largeStar(edges: DataFrame): DataFrame = {
    val nbr = symmetrized(edges)
    val mins = nbr.groupBy("u").agg(min(col("v")).as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("m"))
    nbr.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("m").as("src"), col("v").as("dst"))
      .distinct()
  }

  /** small-star: for each u with at least one SMALLER neighbor, point
    * u and all its smaller neighbors at m = min of those neighbors.
    * m < v <= u throughout, so orientation stays canonical and no
    * self loops are emitted (v == m rows are filtered). */
  private def smallStar(edges: DataFrame): DataFrame = {
    val nbr = symmetrized(edges).filter(col("v") < col("u"))
    val mins = nbr.groupBy("u").agg(min(col("v")).as("m"))
    val repointed = nbr.join(mins, "u")
      .filter(col("v") =!= col("m"))
      .select(col("m").as("src"), col("v").as("dst"))
    val selfEdges = mins.select(col("m").as("src"), col("u").as("dst"))
    repointed.union(selfEdges).distinct()
  }
}
