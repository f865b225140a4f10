package graft

import graft.operators.HeavyHitters
import org.apache.spark.sql.functions._

/** Heavy hitters: the sketch-pruned exact plan vs a naive groupBy on
  * synthetic and corpus data, plus the superset guarantee (the prune
  * never drops a truly-heavy key). */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("heavy hitters: equals naive groupBy on a skewed synthetic stream") {
    // 1000 rows of "hot" (heavy at any φ), 400 of "warm", tail of
    // singletons; N = 2400, T = max(2400/1000, 2) = 2 → heavy =
    // every key with ≥ 2 occurrences
    val keys = (Seq.fill(1000)("hot") ++ Seq.fill(400)("warm") ++
      (1 to 1000).map(i => s"tail_$i")).toDF("key")
      .repartition(8)
    val got = HeavyHitters.heavyHitters(keys)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val want = keys.groupBy("key").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= lit(2400L / HeavyHitters.phiDenom)
        .cast("long") || col("cnt") >= HeavyHitters.floorCount)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === Map("hot" -> 1000L, "warm" -> 400L))
    assert(got === want.filter(_._2 >= 2))
  }

  test("heavy hitters: corpus bigrams match the naive plan exactly") {
    val dir = "/root/testdata/sf0.001"
    val got = HeavyHitters.qHeavyHitters(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // naive: same bigram stream, plain groupBy + HAVING
    val bigrams = Tables(spark, dir, "documents")
      .select(expr(
        "filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')")
        .as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), " +
          "i -> concat(toks[i], ' ', toks[i + 1]))")).as("key"))
    val n = bigrams.count()
    val t = math.max(n / HeavyHitters.phiDenom, HeavyHitters.floorCount)
    val want = bigrams.groupBy("key").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= t)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("heavy hitters: count-min estimate over-estimates (prune is safe)") {
    // for every surviving key, its sketch estimate must be ≥ its true
    // count — the collision-only-adds invariant the prune relies on
    val keys = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++
      (1 to 500).map(i => s"t$i")).toDF("key")
    val out = HeavyHitters.heavyHitters(keys)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out("a") === 50L && out("b") === 30L)
  }
}
