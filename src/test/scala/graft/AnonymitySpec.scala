package graft

import graft.operators.Anonymity

/** k-anonymity/l-diversity profile: hand-planted equivalence classes
  * give exact risk masses; testdata invariants. */
class AnonymitySpec extends SparkSpec {
  import spark.implicits._

  test("planted classes: risk masses exact per threshold") {
    // QI classes: A×1 row, B×3 rows, C×10 rows; sensitive: A has 1
    // distinct value, B 3, C 2
    val rows =
      Seq(("A", "s1")) ++
      (1 to 3).map(i => ("B", s"s$i")) ++
      (1 to 10).map(i => ("C", s"s${i % 2}"))
    val df = rows.toDF("qi", "sens")
    val out = Anonymity.kAnonymityProfile(df, Seq("qi"), "sens")
      .collect().map(r => r.getInt(0) -> r).toMap
    // k=2: only A (size 1) is risky → 1 class, 1 row
    assert(out(2).getLong(3) === 1L && out(2).getLong(4) === 1L)
    // k=5: A and B risky → 2 classes, 4 rows
    assert(out(5).getLong(3) === 2L && out(5).getLong(4) === 4L)
    // k=25: all risky → 3 classes, 14 rows, share 1.0
    assert(out(25).getLong(3) === 3L && out(25).getLong(4) === 14L)
    assert(out(25).getDouble(5) === 1.0)
    // k-independent floors repeat on every row
    assert(out.values.forall(r => r.getLong(6) === 1L)) // min class size
    assert(out.values.forall(r => r.getLong(7) === 1L)) // min l (class A)
  }

  test("driver query: one row per threshold, monotone risk") {
    val out = Anonymity.qKAnonymity(spark, "/root/testdata/sf0.001")
      .orderBy("k").collect()
    assert(out.length === Anonymity.kThresholds.length)
    // risk mass is monotone non-decreasing in k; shares in [0,1]
    val shares = out.map(_.getDouble(5))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(shares.forall(s => s >= 0.0 && s <= 1.0))
    // n_rows constant across thresholds (same population)
    assert(out.map(_.getLong(2)).distinct.length === 1)
  }
}
