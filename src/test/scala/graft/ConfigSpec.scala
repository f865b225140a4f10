package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.config.{Config, Converters}

class ConfigSpec extends AnyFunSuite {

  private val yamlText =
    """---
      |name: "RenewalList.CSV"
      |jsonfile: "schemas/renewals_bq.json"
      |date_col: "PolicyExpiryDate"
      |convert_funcs:
      |  'PolicyNumber': 'strip_excel'
      |  'AgencyNumber': 'strip_excel'
      |table_new: "retention_update"
      |table_old: "retention"
      |uri1: 'upload/RenewalList.CSV'
      |uri2: 'processed/Retention.CSV'
      |...
      |---
      |name: "ProductionRpt.xlsx"
      |jsonfile: "schemas/optiom_bq.json"
      |date_col: "TRANS_DATE"
      |table_new: "optiom_update"
      |table_old: "optiom"
      |uri2: 'processed/Optiom.CSV'
      |...
      |""".stripMargin

  test("P11: multi-doc YAML -> typed configs") {
    val confs = Config.loadAll(yamlText)
    assert(confs.size === 2)
    val r = confs.head
    assert(r.name === "RenewalList.CSV")
    assert(r.dateCol === "PolicyExpiryDate")
    assert(r.convertFuncs === Map(
      "PolicyNumber" -> "strip_excel", "AgencyNumber" -> "strip_excel"))
    val o = confs(1)
    assert(o.uri1.isEmpty && o.convertFuncs.isEmpty)
  }

  test("P10: filename routing — ProductionRpt variants -> xlsx doc") {
    val confs = Config.loadAll(yamlText)
    assert(Config.forFile(confs, "ProductionRpt (3).xlsx").get.name ===
      "ProductionRpt.xlsx")
    assert(Config.forFile(confs, "RenewalList.CSV").get.name ===
      "RenewalList.CSV")
    assert(Config.forFile(confs, "Unknown.csv").isEmpty)
  }

  test("X1: unknown converter name is an error, not an eval") {
    intercept[IllegalArgumentException](Converters("drop_table"))
  }
}

/** P9 — strip_excel must behave exactly like Python's str.strip('"='):
  * remove any run of '"' and '=' characters from BOTH ends, nothing from
  * the middle. Property-checked against a reference implementation. */
class StripExcelSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import org.scalacheck.Gen

  private def pythonStrip(s: String, chars: Set[Char]): String =
    s.dropWhile(chars.contains).reverse.dropWhile(chars.contains).reverse

  test("strip_excel == python str.strip('\"=') on arbitrary junk") {
    import spark.implicits._
    val junk = Gen.listOf(Gen.oneOf('"', '=', 'a', '0', ' ', 'é', '\t'))
      .map(_.mkString)
    // one Spark job over all samples (per-sample jobs would be slow)
    val samples = {
      val buf = scala.collection.mutable.ListBuffer[String]()
      forAllSamples(junk, 200)(buf += _)
      buf.toSeq
    }
    val got = samples.toDF("c")
      .select(Converters.stripExcel(col("c"))).as[String].collect().toSeq
    assert(got === samples.map(pythonStrip(_, Set('"', '='))))
  }

  test("canonical Excel artifacts") {
    import spark.implicits._
    val df = Seq("=\"0123\"", "\"0456\"", "=789", "plain").toDF("c")
      .select(Converters.stripExcel(col("c")).as("c"))
    assert(df.as[String].collect().toSeq === Seq("0123", "0456", "789", "plain"))
  }
}
