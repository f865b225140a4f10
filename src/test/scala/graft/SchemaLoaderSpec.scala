package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.schema.SchemaLoader

/** S3 — schema loader against the three real reference schema files
  * (copied as fixtures; reference Schemas/renewals_bq.json etc.). */
class SchemaLoaderSpec extends AnyFunSuite {

  private def load(name: String) = SchemaLoader.parse(
    scala.io.Source.fromResource(s"schemas/$name").mkString)

  test("renewals: 117 nullable fields, correct type mapping") {
    val fields = load("renewals_bq.json")
    assert(fields.size === 117)
    val st = SchemaLoader.toStructType(fields)
    assert(st("PolicyNumber").dataType === StringType)
    assert(st("PolicyExpiryDate").dataType === DateType)
    assert(st("LeaseIndicator").dataType === BooleanType)
    assert(st("CommissionAmt").dataType === DecimalType(38, 9)) // NUMERIC
    assert(st.fields.forall(_.nullable))
  }

  test("transactions: 79 fields; EntryDateTime is declared DATE") {
    val fields = load("transactions_bq.json")
    assert(fields.size === 79)
    val st = SchemaLoader.toStructType(fields)
    assert(st("EntryDateTime").dataType === DateType)
    assert(st("CommTotal").dataType === DecimalType(38, 9))
    assert(SchemaLoader.dateCols(fields).contains("EntryDateTime"))
  }

  test("optiom: 47 fields incl. SOURCE; FLOAT -> DoubleType") {
    val fields = load("optiom_bq.json")
    assert(fields.size === 47)
    val st = SchemaLoader.toStructType(fields)
    assert(st("SOURCE").dataType === StringType)
    assert(st("TOTAL_PREMIUM").dataType === DoubleType)
    assert(st("TRANS_DATE").dataType === DateType)
  }

  test("declared column order is preserved") {
    val fields = load("optiom_bq.json")
    assert(SchemaLoader.colNames(fields).last === "SOURCE")
  }

  test("INTEGER -> LongType, unknown type rejected") {
    import SchemaLoader.FieldSpec
    assert(SchemaLoader.sparkType("INTEGER") === LongType)
    intercept[IllegalArgumentException](SchemaLoader.sparkType("GEOGRAPHY"))
    // mode REQUIRED -> not nullable
    val st = SchemaLoader.toStructType(
      Seq(FieldSpec("k", "INTEGER", "REQUIRED")))
    assert(!st("k").nullable)
  }
}
