package graft

import scala.math.BigDecimal.RoundingMode

import graft.ext.KMeansOps

/** Integer-exact Lloyd k-means: full driver-side Scala replay of the
  * quantize/seed/iterate pipeline vs the engine, quota/membership of the
  * cluster-balanced sample, and the map-only-assignment plan claim. */
class KMeansSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Independent reimplementation (plain Scala over collected rows) of
    * the exact semantics qKmeansSql also replays. */
  private def replay(k: Int, iters: Int): Map[Long, (Int, Long)] = {
    val raw = Tables(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => BigDecimal(x.toDouble * 1000)
          .setScale(0, RoundingMode.HALF_UP).toLong).toArray)
      .toMap
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val seeds = raw.keys.toSeq.sortBy(id => (md5hex(id.toString), id)).take(k)
    var cents: Array[Array[Long]] =
      seeds.map(id => raw(id).map(_ * 1000L)).toArray
    def dist2(xm: Array[Long], c: Array[Long]): Long =
      xm.zip(c).map { case (x, ct) =>
        val d = x * 1000 - ct; d * d
      }.sum
    def assign(): Map[Long, (Int, Long)] = raw.map { case (id, xm) =>
      val ds = cents.map(dist2(xm, _))
      val m = ds.min
      id -> (ds.indexOf(m), m) // indexOf = smallest cluster on ties
    }
    for (_ <- 1 until iters) {
      val a = assign()
      // toSeq: grouping the key SET would make ids a Set, whose map
      // dedups equal coordinate values before the sum
      val groups = raw.keys.toSeq.groupBy(id => a(id)._1)
      cents = cents.indices.map { c =>
        groups.get(c) match {
          case Some(ids) =>
            val n = ids.size.toLong
            (0 until cents(c).length).map { j =>
              val s = ids.map(raw(_)(j)).sum
              (s / n) * 1000 + ((s % n) * 1000) / n
            }.toArray
          case None => cents(c)
        }
      }.toArray
    }
    assign()
  }

  test("kmeans: engine matches the driver-side exact replay") {
    val got = KMeansOps.qKmeans(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val want = replay(KMeansOps.kmK, KMeansOps.kmIters)
    assert(got.size === want.size)
    assert(got === want)
    // the run actually separates space: more than one cluster in use
    assert(got.values.map(_._1).toSet.size > 1)
  }

  test("kmeans: final assignment is map-only (no exchange)") {
    val plan = KMeansOps.qKmeans(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment should not shuffle:\n$plan")
  }

  test("cluster sample: per-cluster quota, members consistent, " +
    "WindowGroupLimit plan") {
    val assignDf = KMeansOps.qKmeans(spark, dir)
    val assigned = assignDf.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val df = KMeansOps.qClusterSample(spark, dir)
    val rows = df.collect()
    val byCluster = rows.groupBy(_.getInt(1))
    byCluster.foreach { case (_, rs) =>
      assert(rs.length <= KMeansOps.clusterQuota)
      assert(rs.map(_.getLong(2)).sorted.toSeq === (1L to rs.length))
    }
    rows.foreach(r => assert(assigned(r.getLong(0)) === r.getInt(1)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit:\n$plan")
  }
}
