package graft.schema

import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** S3 — external schema registry: BigQuery-style JSON schema file
  * (`[{"name":…,"type":…,"mode":…}, …]`, reference `Schemas/<type>.json`,
  * loaded at `config.py:60-63`) → Spark `StructType`.
  *
  * Type mapping per SURVEY.md §1.2: we map the DECLARED warehouse types,
  * not the reference's lossy pandas in-flight degradation (`config.py:
  * 84-90` turns INTEGER/NUMERIC into float64 and BOOLEAN into str purely
  * for NaN support — Spark columns are natively nullable, so nothing
  * needs degrading). The `eval`-based builder at `config.py:76-79` is
  * replaced by plain parsing.
  */
object SchemaLoader {

  final case class FieldSpec(name: String, bqType: String, mode: String)

  def sparkType(bqType: String): DataType = bqType.toUpperCase match {
    case "STRING"    => StringType
    case "NUMERIC"   => DecimalType(38, 9) // BQ NUMERIC semantics
    case "FLOAT"     => DoubleType
    case "INTEGER"   => LongType
    case "BOOLEAN"   => BooleanType
    case "DATE"      => DateType
    case "DATETIME" | "TIMESTAMP" => TimestampType
    case other =>
      throw new IllegalArgumentException(s"unsupported schema type: $other")
  }

  def parse(json: String): Seq[FieldSpec] = {
    implicit val fmts: Formats = DefaultFormats
    JsonMethods.parse(json) match {
      case JArray(items) => items.map { item =>
        FieldSpec(
          (item \ "name").extract[String],
          (item \ "type").extract[String],
          (item \ "mode").extractOrElse[String]("NULLABLE"))
      }
      case _ => throw new IllegalArgumentException(
        "schema file must be a JSON array of {name,type,mode} objects")
    }
  }

  def toStructType(fields: Seq[FieldSpec]): StructType =
    StructType(fields.map(f =>
      StructField(f.name, sparkType(f.bqType),
        nullable = f.mode.toUpperCase != "REQUIRED")))

  def load(path: String): StructType =
    toStructType(parse(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")))

  /** Column names in declared order (reference `col_names`, config.py:66-68). */
  def colNames(fields: Seq[FieldSpec]): Seq[String] = fields.map(_.name)

  /** DATE-typed columns, parsed leniently at ingest (reference `dates`,
    * config.py:95-97). */
  def dateCols(fields: Seq[FieldSpec]): Seq[String] =
    fields.filter(_.bqType.toUpperCase == "DATE").map(_.name)
}
