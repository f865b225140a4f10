package graft

import graft.streaming.PrivacyLedger

class PrivacyLedgerSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val cost = graft.operators.DpRelease.epsCountMicro +
    graft.operators.DpRelease.epsSumMicro // 500000 per release

  test("releases spend the budget; the over-budget release is refused") {
    val tmp = java.nio.file.Files.createTempDirectory("dpledger")
      .toFile.getAbsolutePath + "/store"
    val budget = 2L * cost + cost / 2 // room for exactly two releases
    val r1 = PrivacyLedger.release(spark, dir, tmp, "customer", 0L, budget)
    assert(r1.isDefined)
    assert(r1.get.count() === 25L)
    val r2 = PrivacyLedger.release(spark, dir, tmp, "customer", 1L, budget)
    assert(r2.isDefined)
    assert(PrivacyLedger.spent(spark, tmp, "customer") === 2L * cost)
    // third would exceed: refused, nothing computed, nothing charged
    val r3 = PrivacyLedger.release(spark, dir, tmp, "customer", 2L, budget)
    assert(r3.isEmpty)
    assert(PrivacyLedger.spent(spark, tmp, "customer") === 2L * cost)
  }

  test("replaying a release id re-writes its own spend, not a new one") {
    val tmp = java.nio.file.Files.createTempDirectory("dpledger2")
      .toFile.getAbsolutePath + "/store"
    val budget = 10L * cost
    assert(PrivacyLedger.release(spark, dir, tmp, "customer", 0L, budget)
      .isDefined)
    val before = PrivacyLedger.spent(spark, tmp, "customer")
    // crash-replay of release 0: overwrites batch=0, no double charge
    assert(PrivacyLedger.release(spark, dir, tmp, "customer", 0L, budget)
      .isDefined)
    assert(PrivacyLedger.spent(spark, tmp, "customer") === before)
  }

  test("budgets are per scope; an empty ledger reads zero") {
    val tmp = java.nio.file.Files.createTempDirectory("dpledger3")
      .toFile.getAbsolutePath + "/store"
    assert(PrivacyLedger.spent(spark, tmp, "customer") === 0L)
    assert(PrivacyLedger.release(spark, dir, tmp, "scopeA", 0L, cost)
      .isDefined)
    assert(PrivacyLedger.spent(spark, tmp, "scopeA") === cost)
    assert(PrivacyLedger.spent(spark, tmp, "scopeB") === 0L)
    // scopeA exhausted its budget; scopeB still has room
    assert(PrivacyLedger.release(spark, dir, tmp, "scopeA", 1L, cost)
      .isEmpty)
    assert(PrivacyLedger.release(spark, dir, tmp, "scopeB", 2L, cost)
      .isDefined)
  }
}
