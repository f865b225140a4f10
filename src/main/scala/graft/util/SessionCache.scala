package graft.util

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-scoped memoization for expensive, checkpoint-backed artifacts
  * (the IVF ANN index, the row-numbered TRANSACTIONS core) — the Spark
  * analog of a warehouse materializing a view or index table once and
  * serving every query from it.
  *
  * Keying: a cached artifact holds localCheckpoint blocks that live in
  * ONE SparkContext, so it must never outlive or cross its building
  * session. Keys therefore use the session's `sessionUUID` — genuinely
  * unique per session object — NOT `System.identityHashCode`, whose
  * values recur after GC and could serve a new session an artifact
  * backed by a dead context's blocks.
  *
  * Eviction: a listener registered once per SparkContext clears every
  * entry when that context ends, so stopped-session artifacts don't
  * accumulate across session lifetimes in long-lived JVMs (test suites,
  * notebook drivers).
  */
object SessionCache {

  private val entries = new ConcurrentHashMap[String, AnyRef]()
  private val hookedContexts = ConcurrentHashMap.newKeySet[String]()
  private val ownedRdds = ConcurrentHashMap.newKeySet[Int]()

  /** Unique id for a session: `sessionUUID` on the classic session (the
    * only implementation this engine runs on); identity hash only as a
    * last-resort fallback for exotic SparkSession subclasses. */
  def sessionKey(spark: SparkSession): String =
    org.apache.spark.sql.graftshim.InternalRowDF.sessionUUID(spark)
      .getOrElse(s"idhash-${System.identityHashCode(spark)}")

  /** Build-once-per-(session, scope, dir) memoization. `build` runs at
    * most once per key (ConcurrentHashMap.computeIfAbsent contract). */
  def memoize[T <: AnyRef](spark: SparkSession, scope: String, dir: String)
                          (build: => T): T = {
    val ctxId = spark.sparkContext.applicationId
    if (hookedContexts.add(ctxId)) {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          entries.clear()
          ownedRdds.clear()
          hookedContexts.remove(ctxId)
        }
      })
    }
    entries
      .computeIfAbsent(s"${sessionKey(spark)}|$scope|$dir", { _ =>
        // Record which persistent RDDs the build creates: those blocks
        // back the memoized artifact and must survive any sweep-level
        // cleanup ([[dropTransientBlocks]]) that evicts per-invocation
        // checkpoint garbage between queries.
        val before = spark.sparkContext.getPersistentRDDs.keySet
        val built = build
        (spark.sparkContext.getPersistentRDDs.keySet -- before)
          .foreach(ownedRdds.add(_))
        built
      })
      .asInstanceOf[T]
  }

  /** Unpersist every persistent RDD NOT owned by a memoized artifact.
    *
    * Why this exists: operators that localCheckpoint an intermediate
    * (row numbering, LSH candidate tables) create cached blocks that are
    * garbage the moment their query completes — each invocation builds
    * fresh ones and never revisits the old. In a long-lived many-query
    * JVM (the bench sweep, the verify gate) dozens of those generations
    * otherwise coexist, and whichever heavy query runs next pays their
    * eviction/GC tax — measured in round 4 as phantom >2× in-sweep
    * regressions that vanished in isolation. Safe by construction: an
    * unowned checkpointed RDD is never re-executed (the next invocation
    * builds a new one), so dropping its blocks can't trigger a
    * recompute-after-checkpoint failure. */
  def dropTransientBlocks(spark: SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!ownedRdds.contains(id)) rdd.unpersist(blocking = false)
    }

  /** Test/maintenance hook: drop everything (e.g. between suites that
    * rewrite the data a cached artifact was built from). Formerly-owned
    * blocks become transient and fall to the next
    * [[dropTransientBlocks]] pass. */
  def clear(): Unit = {
    entries.clear()
    ownedRdds.clear()
  }
}
