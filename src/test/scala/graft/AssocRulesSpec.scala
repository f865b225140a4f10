package graft

import graft.operators.AssocRules

/** Association rules: hand-computed supports/confidence/lift, the
  * Apriori prune, and the Spark-SQL replay of the oracle text. */
class AssocRulesSpec extends SparkSpec {
  import spark.implicits._

  test("assoc rules: hand-computed metrics and pruning") {
    // o1={1,2} o2={1,2} o3={1,3} o4={2}: N=4, sup(1)=3, sup(2)=3,
    // sup(3)=1 (pruned — below minSup). Only frequent pair (1,2) sup 2.
    // conf(1→2) = 1000·2 div 3 = 666; lift = 1000·4·2 div 9 = 888.
    val li = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L), (4L, 2L))
      .toDF("l_orderkey", "l_partkey")
    val rows = AssocRules.assocRules(li).collect()
      .map(r => (r.getLong(1), r.getLong(0)) ->
        (r.getLong(2), r.getLong(5), r.getLong(6))).toMap
    assert(rows.size === 2)
    assert(rows((2L, 1L)) === ((2L, 666L, 888L)))
    assert(rows((1L, 2L)) === ((2L, 666L, 888L)))
  }

  test("assoc rules: duplicate lineitems dedup into one basket entry") {
    // the same part twice in one order must count ONE basket occurrence
    val li = Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L))
      .toDF("l_orderkey", "l_partkey")
    val r = AssocRules.assocRules(li).collect()
    assert(r.forall(_.getLong(2) === 2L)) // sup_pair
    assert(r.forall(_.getLong(3) === 2L)) // sup_ante
  }

  test("assoc rules: engine equals its own oracle text on the corpus") {
    val dir = "/root/testdata/sf0.001"
    Tables.registerAll(spark, dir)
    val got = AssocRules.qAssocRules(spark, dir).collect()
      .map(_.toSeq).toSet
    val want = spark.sql(
      AssocRules.qAssocRulesSql.replace(" // ", " div ")).collect()
      .map(_.toSeq).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }
}
