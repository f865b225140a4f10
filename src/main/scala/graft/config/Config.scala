package graft.config

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.yaml.snakeyaml.Yaml
import scala.jdk.CollectionConverters._

/** P11 — config-driven generic pipeline: one YAML document per data type
  * (reference `settings.yaml`, scanned at `config.py:44-52`), loaded into
  * a typed case class instead of a raw dict.
  */
final case class PipelineConf(
    name: String,
    jsonfile: String,
    dateCol: String,
    convertFuncs: Map[String, String],
    tableNew: String,
    tableOld: String,
    uri1: Option[String],
    uri2: Option[String])

object Config {

  /** Parse a multi-document YAML config string (the reference's
    * `yaml.load_all` shape). Unknown keys are ignored; missing optional
    * keys (uri1/uri2/convert_funcs — the Excel doc has no uri1 or
    * convert_funcs, `settings.yaml:125-131`) default sensibly. */
  def loadAll(yamlText: String): Seq[PipelineConf] = {
    val yaml = new Yaml()
    yaml.loadAll(yamlText).asScala.toSeq.collect {
      case m: java.util.Map[_, _] =>
        val doc = m.asInstanceOf[java.util.Map[String, Object]].asScala
        def str(k: String): Option[String] =
          doc.get(k).map(_.toString)
        PipelineConf(
          name = str("name").getOrElse(
            throw new IllegalArgumentException("config doc missing 'name'")),
          jsonfile = str("jsonfile").getOrElse(""),
          dateCol = str("date_col").getOrElse(""),
          convertFuncs = doc.get("convert_funcs") match {
            case Some(cf: java.util.Map[_, _]) =>
              cf.asInstanceOf[java.util.Map[String, String]].asScala.toMap
            case _ => Map.empty
          },
          tableNew = str("table_new").getOrElse(""),
          tableOld = str("table_old").getOrElse(""),
          uri1 = str("uri1"),
          uri2 = str("uri2"))
    }
  }

  def load(path: String): Seq[PipelineConf] =
    loadAll(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  /** P10 — filename → config routing. Excel production reports arrive
    * with varying names; anything containing "ProductionRpt" routes to
    * the canonical xlsx doc (reference `config.py:36-41,47-49`). */
  def forFile(confs: Seq[PipelineConf], fileName: String): Option[PipelineConf] = {
    val canonical =
      if (fileName.contains("ProductionRpt")) "ProductionRpt.xlsx" else fileName
    confs.find(_.name == canonical)
  }
}

/** P8/X1 — the converter-function registry. The reference dispatches
  * config-named converters via `eval` (`config.py:100-102`); here they
  * are a closed registry of named `Column => Column` expression builders
  * (codegen-friendly — no UDFs).
  */
object Converters {

  /** P9/F7 — `strip_excel` (reference `config.py:31-33`): strip any
    * leading/trailing `"` and `=` characters (Excel `="0123"` artifacts).
    * Python's `str.strip('"=')` is exactly char-set trim ≡ `btrim`. */
  val stripExcel: Column => Column = c => btrim(c, lit("\"="))

  val registry: Map[String, Column => Column] = Map(
    "strip_excel" -> stripExcel)

  def apply(name: String): Column => Column =
    registry.getOrElse(name,
      throw new IllegalArgumentException(s"unknown converter: $name"))
}
