package graft

import org.apache.spark.sql.functions._
import graft.util.SessionCache

/** Session-scoped memoization: ownership protects memo blocks from the
  * transient sweep, and artifacts of discarded sessions are reclaimed
  * on a later memoize. */
class SessionCacheSpec extends SparkSpec {

  test("nested memoize works and ownership stays disjoint " +
    "(the computeIfAbsent recursive-update regression)") {
    SessionCache.clear()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    var innerBuilds = 0
    def inner() = SessionCache.memoize(spark, "spec-inner", "x") {
      innerBuilds += 1
      spark.range(40).toDF("n").localCheckpoint()
    }
    // an OUTER artifact whose build memoizes the inner one — this is
    // q_source_overlap's shape (the near-dup pair view inside the
    // overlap build); with computeIfAbsent it threw "Recursive update"
    // whenever the sweep order left the inner key cold
    val outer = SessionCache.memoize(spark, "spec-outer", "x") {
      inner().selectExpr("n * 2 as m").localCheckpoint()
    }
    assert(outer.count() === 40)
    assert(innerBuilds === 1)
    // both entries serve independently; inner did NOT rebuild
    assert(inner().count() === 40)
    assert(innerBuilds === 1)
    // evicting the OUTER key must not kill the inner entry's blocks
    val innerIds = spark.sparkContext.getPersistentRDDs.keySet -- before
    SessionCache.evictKeys(Set(
      s"${SessionCache.sessionKey(spark)}|spec-outer|x"))
    assert(inner().count() === 40) // still served, blocks intact
    assert(innerBuilds === 1)
    assert(innerIds.nonEmpty)
    SessionCache.clear()
    SessionCache.dropTransientBlocks(spark)
  }

  test("memo blocks survive the transient sweep; unowned blocks do not") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val memo = SessionCache.memoize(spark, "spec-owned", "x") {
      spark.range(100).toDF("n").localCheckpoint()
    }
    val owned = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(owned.nonEmpty)
    // an unowned (plain) checkpoint alongside it
    val loose = spark.range(50).toDF("n").localCheckpoint()
    assert(loose.count() === 50)
    val withLoose = spark.sparkContext.getPersistentRDDs.keySet
    assert((withLoose -- before -- owned).nonEmpty)

    SessionCache.dropTransientBlocks(spark)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    owned.foreach(id => assert(after.contains(id), "memo block dropped"))
    assert((after -- before -- owned).isEmpty, "loose block survived")
    assert(memo.count() === 100) // memoized artifact still serves
    SessionCache.clear()
    SessionCache.dropTransientBlocks(spark)
  }

  test("USAGE.md lifecycle snippet: cycling a session + evictSession reclaims its blocks") {
    // the exact shape the user guide prescribes for one-session-per-
    // tenant JVMs, run against the real memoized view core
    val dir = "/root/testdata/sf0.001"
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val tenant = spark.newSession()
    try {
      assert(graft.views.Views.transactions(tenant, dir).count() > 0)
      val owned = spark.sparkContext.getPersistentRDDs.keySet -- before
      assert(owned.nonEmpty, "view core should checkpoint")
    } finally {
      SessionCache.evictSession(tenant)
    }
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      "retired session's checkpoint blocks must be unpersisted")
  }

  test("evictSession releases exactly the retired session's memo blocks") {
    // NOTE eviction is explicit by design: a cached DataFrame strongly
    // references its building session, so a GC/weak-reference sweep
    // could never fire — the cache itself would keep every session
    // reachable. (An earlier weak-ref design was dead code for exactly
    // that reason.)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val child = spark.newSession()
    SessionCache.memoize(child, "spec-dead", "y") {
      child.range(100).toDF("n").localCheckpoint()
    }
    val childOwned = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(childOwned.nonEmpty)
    // a surviving session's memo, which must NOT be touched
    val keep = SessionCache.memoize(spark, "spec-live", "y") {
      spark.range(70).toDF("n").localCheckpoint()
    }
    val liveOwned =
      spark.sparkContext.getPersistentRDDs.keySet -- before -- childOwned

    SessionCache.evictSession(child)
    val now = spark.sparkContext.getPersistentRDDs.keySet
    childOwned.foreach(id =>
      assert(!now.contains(id), "retired session's block survived"))
    liveOwned.foreach(id =>
      assert(now.contains(id), "surviving session's block was dropped"))
    assert(keep.count() === 70)
    // re-memoizing under the retired session's key rebuilds, not serves
    // a dead artifact
    val rebuilt = SessionCache.memoize(child, "spec-dead", "y") {
      child.range(30).toDF("n").localCheckpoint()
    }
    assert(rebuilt.count() === 30)
    SessionCache.clear()
    SessionCache.dropTransientBlocks(spark)
  }

  test("round-8 sweep telemetry: access log drains per query, pinned " +
    "bytes track owned blocks, evictKeys releases and rebuilds") {
    SessionCache.clear()
    SessionCache.drainAccesses()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // build two artifacts; each memoize (build AND hit) is logged
    SessionCache.memoize(spark, "spec-a", "z") {
      spark.range(200).toDF("n").localCheckpoint()
    }
    SessionCache.memoize(spark, "spec-b", "z") {
      spark.range(100).toDF("n").localCheckpoint()
    }
    val accessed = SessionCache.drainAccesses()
    assert(accessed.exists(_.contains("|spec-a|z")))
    assert(accessed.exists(_.contains("|spec-b|z")))
    assert(SessionCache.drainAccesses().isEmpty) // drained means drained
    // a cache HIT is an access too (the bench's dependency map needs
    // hits, not just builds)
    SessionCache.memoize(spark, "spec-a", "z") {
      fail("hit must not rebuild"); null
    }
    assert(SessionCache.drainAccesses().exists(_.contains("|spec-a|z")))
    // pinned bytes: both artifacts' blocks are counted
    val pinned = SessionCache.pinnedBytes(spark)
    assert(pinned > 0L)
    // evict ONE by key: its blocks go, the other's stay, a later
    // memoize on the evicted key rebuilds
    val aKey = accessed.find(_.contains("|spec-a|z")).get
    SessionCache.evictKeys(Set(aKey))
    assert(SessionCache.pinnedBytes(spark) < pinned)
    var rebuilt = false
    val again = SessionCache.memoize(spark, "spec-a", "z") {
      rebuilt = true
      spark.range(40).toDF("n").localCheckpoint()
    }
    assert(rebuilt && again.count() === 40)
    // the surviving artifact still serves from its blocks
    assert(SessionCache.memoize(spark, "spec-b", "z") {
      fail("survivor must not rebuild"); null
    }.asInstanceOf[org.apache.spark.sql.DataFrame].count() === 100)
    SessionCache.clear()
    SessionCache.dropTransientBlocks(spark)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty)
  }
}
