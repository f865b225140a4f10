package graft

import graft.ext.EmbedGeometry

/** Embedding geometry: hand frames — centered isotropic vectors pin
  * anisotropy to 0 and PR to the axis count; a one-axis space pins
  * eff_dim to 1; a constant offset shows up as ‖μ‖² exactly. */
class EmbedGeometrySpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: Seq[Array[Float]]) =
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")

  test("centered 2-axis frame: zero anisotropy, eff_dim = 2") {
    // ±e1 and ±e2: mean 0, var 1/2 on both axes
    val df = emb(Seq(
      Array(1f, 0f), Array(-1f, 0f), Array(0f, 1f), Array(0f, -1f)))
    val r = EmbedGeometry.embedGeometry(df).collect().head
    assert(r.getLong(r.fieldIndex("mu_norm2_micro")) === 0L)
    assert(r.getLong(r.fieldIndex("eff_dim_micro")) === 2000000L)
    assert(!r.getBoolean(r.fieldIndex("anisotropic")))
    assert(r.getLong(r.fieldIndex("mean_var_micro")) === 500000L)
  }

  test("one-axis variance: eff_dim = 1; offset shows as ||mu||^2") {
    val df = emb(Seq(Array(1f, 0.5f), Array(-1f, 0.5f)))
    val r = EmbedGeometry.embedGeometry(df).collect().head
    // variance only on axis 0 → PR = 1, top dim 0
    assert(r.getLong(r.fieldIndex("eff_dim_micro")) === 1000000L)
    assert(r.getInt(r.fieldIndex("top_var_dim")) === 0)
    // μ = (0, 0.5) → ||μ||² = 0.25
    assert(r.getLong(r.fieldIndex("mu_norm2_micro")) === 250000L)
    assert(r.getBoolean(r.fieldIndex("anisotropic")))
  }
}
