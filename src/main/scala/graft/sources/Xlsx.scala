package graft.sources

import java.io.{ByteArrayInputStream, InputStream}
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import scala.collection.mutable.ArrayBuffer

/** S2 — native .xlsx reader (reference `config.py:109-118`:
  * `pd.read_excel(uri, sheet_name=…, engine='openpyxl')` for the
  * two-sheet ProductionRpt workbook). No external library: an .xlsx file
  * is a zip of XML parts, parsed here with `java.util.zip` + StAX.
  *
  * Scale model: a single workbook is capped by the format itself
  * (1,048,576 rows — tens of MB compressed), so ONE workbook is a
  * single-task parse; THROUGHPUT comes from parallelism across files.
  * [[readSheet]] therefore distributes via `binaryFiles` (one task per
  * workbook, parsing inside executors) and only the header row of one
  * file is parsed on the driver to fix the schema. This mirrors how the
  * reference scales: one Cloud Function invocation per uploaded file.
  *
  * Fidelity notes (deliberately scoped to what the pipeline consumes):
  * every cell is surfaced as a STRING (shared strings, inline strings,
  * formula caches and raw numerics alike) — the downstream clean stage
  * (P4 ''→NULL, P3 try_to_date, P5 try_cast) owns typing, exactly as it
  * does for CSV input. Excel date-serial cells arrive as their numeric
  * string; the reference corpus ships dates as text, matching this.
  */
object Xlsx {

  /** Parts of a workbook we read. Zip entries are streamed once into
    * memory — bounded by the format's size cap, and `binaryFiles` has
    * already materialized the bytes anyway. */
  private def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory &&
        (e.getName == "xl/workbook.xml" ||
          e.getName == "xl/_rels/workbook.xml.rels" ||
          e.getName == "xl/sharedStrings.xml" ||
          e.getName.startsWith("xl/worksheets/")))
        out += e.getName -> zin.readAllBytes()
      e = zin.getNextEntry
    }
    zin.close()
    out.result()
  }

  /** Hardened StAX reader (no DTDs / external entities — these files
    * come from an upload bucket). */
  private def xml(bytes: Array[Byte]) = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes))
  }

  /** 0-based column index of an A1-style cell ref ("BC12" → 54). */
  private[graft] def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && Character.isLetter(ref.charAt(i))) {
      acc = acc * 26 + (ref.charAt(i) - 'A' + 1); i += 1
    }
    acc - 1
  }

  /** sheet name → worksheet part path, via workbook.xml (name + r:id)
    * joined to the rels part (Id → Target). */
  private def sheetPath(parts: Map[String, Array[Byte]], sheet: String): String = {
    var rid: String = null
    val wb = xml(parts("xl/workbook.xml"))
    while (wb.hasNext) {
      if (wb.next() == XMLStreamConstants.START_ELEMENT &&
        wb.getLocalName == "sheet" &&
        wb.getAttributeValue(null, "name") == sheet) {
        var i = 0
        while (i < wb.getAttributeCount) {
          if (wb.getAttributeLocalName(i) == "id") rid = wb.getAttributeValue(i)
          i += 1
        }
      }
    }
    wb.close()
    require(rid != null, s"sheet '$sheet' not found in workbook")
    var target: String = null
    val rels = xml(parts("xl/_rels/workbook.xml.rels"))
    while (rels.hasNext) {
      if (rels.next() == XMLStreamConstants.START_ELEMENT &&
        rels.getLocalName == "Relationship" &&
        rels.getAttributeValue(null, "Id") == rid)
        target = rels.getAttributeValue(null, "Target")
    }
    rels.close()
    require(target != null, s"no relationship for sheet '$sheet'")
    if (target.startsWith("/")) target.drop(1) else "xl/" + target
  }

  /** The shared-string table (si → concatenated t runs). */
  private def sharedStrings(parts: Map[String, Array[Byte]]): IndexedSeq[String] =
    parts.get("xl/sharedStrings.xml").fold(IndexedSeq.empty[String]) { bytes =>
      val out = ArrayBuffer.empty[String]
      val r = xml(bytes)
      var sb: StringBuilder = null
      var inT = false
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "si" => sb = new StringBuilder
          case "t"  => inT = true
          case _    =>
        }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if inT =>
          sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "t"  => inT = false
          case "si" => out += sb.toString
          case _    =>
        }
        case _ =>
      }
      r.close()
      out.toIndexedSeq
    }

  /** All rows of one sheet as string cells (null = absent cell; ""
    * stays "" for the clean stage's P4 to normalize). */
  private[graft] def sheetRows(bytes: Array[Byte], sheet: String): Seq[Array[String]] = {
    val parts = zipEntries(bytes)
    val shared = sharedStrings(parts)
    val r = xml(parts(sheetPath(parts, sheet)))
    val rows = ArrayBuffer.empty[Array[String]]
    var cells: ArrayBuffer[String] = null
    var cellCol = -1
    var cellType = ""
    var buf: StringBuilder = null
    var capture = false
    def endCell(text: String): Unit = {
      val v = cellType match {
        case "s" => shared(text.trim.toInt)
        case "b" => if (text.trim == "1") "true" else "false"
        case _   => text // n (numeric), str (formula cache), inlineStr runs
      }
      while (cells.length <= cellCol) cells += null
      cells(cellCol) = v
    }
    while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "row" => cells = ArrayBuffer.empty[String]
        case "c" =>
          cellCol = Option(r.getAttributeValue(null, "r"))
            .map(colIndex).getOrElse(cellCol + 1)
          cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
          buf = new StringBuilder
        case "v" | "t" => capture = true
        case _ =>
      }
      case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if capture =>
        buf.append(r.getText)
      case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
        case "v" | "t" => capture = false
        case "c"       => endCell(buf.toString)
        case "row"     => rows += cells.toArray
        case _         =>
      }
      case _ =>
    }
    r.close()
    rows.toSeq
  }

  /** One sheet across all matching workbook files as a DataFrame of
    * strings; row 1 of each file is the header (skipped per file after
    * fixing the schema from the first file, like Spark's own CSV
    * header handling). Parsing runs in executors, one task per file. */
  def readSheet(spark: SparkSession, path: String, sheet: String): DataFrame = {
    val files = spark.sparkContext.binaryFiles(path)
    val header = sheetRows(files.first()._2.toArray(), sheet)
      .headOption.getOrElse(Array.empty)
    val n = header.length
    val rows = files.flatMap { case (_, pds) =>
      sheetRows(pds.toArray(), sheet).drop(1).map { cs =>
        Row.fromSeq(Array.tabulate[Any](n)(i =>
          if (i < cs.length) cs(i) else null))
      }
    }
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    spark.createDataFrame(rows, schema)
  }
}
