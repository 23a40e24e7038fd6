package graft.io

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Native .xlsx scan with ZERO dependencies beyond the JDK — an .xlsx
  * file is a zip of XML parts (ECMA-376 / ISO 29500, public), so
  * `java.util.zip` + the built-in StAX parser cover the whole read
  * path: `xl/sharedStrings.xml` for the string table and
  * `xl/worksheets/sheetN.xml` for the cell grid. This closes the S1
  * gap the offline environment left (no spark-excel jar): the
  * reference's first ingestion step is `pd.read_excel`
  * (`utils/parse.py:167-175`), and this reader feeds the same
  * row/column-drop semantics [[Sources.readMinicoreCsv]] preserves.
  *
  * Scale shape: files load through the `binaryFile` source — one task
  * per file, the parse runs WHERE THE BYTES LAND (no driver funnel,
  * no shuffle); only the schema probe reads one file on the driver
  * (the bounded pattern of the TSV header probe). Spreadsheets are a
  * metadata-sized format — per-file parse parallelism is exactly the
  * right amount of distribution.
  *
  * Supported cell forms: shared strings (`t="s"`), inline strings
  * (`t="inlineStr"`), and raw values (numbers/booleans as text);
  * missing cells inside a row read as null (sparse `r="C1"`-style
  * references are respected). Formula caches (`<v>` under a formula
  * cell) read as their cached value — same as pandas. */
object Xlsx {

  /** Column letters of an `A1`-style reference → 0-based column index
    * (`A`→0, `Z`→25, `AA`→26). */
  private[graft] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  private def newFactory(): XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    // spreadsheet parts never need DTDs or external entities — turning
    // them off is both hygiene and a hard requirement for untrusted
    // input
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      java.lang.Boolean.FALSE)
    f
  }

  /** Read every zip entry we care about into memory (entry order inside
    * an .xlsx is arbitrary, so collect first, parse after). */
  private def zipParts(bytes: Array[Byte], wanted: Set[String])
      : Map[String, Array[Byte]] = {
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = scala.collection.mutable.Map.empty[String, Array[Byte]]
    try {
      var e = zis.getNextEntry
      while (e != null) {
        if (wanted(e.getName)) out(e.getName) = zis.readAllBytes()
        e = zis.getNextEntry
      }
    } finally zis.close()
    out.toMap
  }

  /** `xl/sharedStrings.xml` → the string table. Rich-text runs
    * (`<si><r><t>…`) concatenate their `<t>` pieces, matching every
    * mainstream reader. */
  private def parseSharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val r = newFactory().createXMLStreamReader(new ByteArrayInputStream(bytes))
    val sb = new StringBuilder
    var inT = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => sb.clear()
              case "t" => inT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inT) sb.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" => inT = false
              case "si" => out += sb.toString
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    out.toIndexedSeq
  }

  /** One worksheet part → rows of cell strings, in sheet order. Missing
    * cells become "" (null after schema application); each row is as
    * wide as its right-most populated cell. */
  private def parseSheet(bytes: Array[Byte], sst: IndexedSeq[String])
      : Seq[Seq[String]] = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val r = newFactory().createXMLStreamReader(new ByteArrayInputStream(bytes))
    val cur = scala.collection.mutable.Map.empty[Int, String]
    val sb = new StringBuilder
    var cellCol = -1
    var cellType = ""
    var collecting = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" => cur.clear()
              case "c" =>
                val ref = Option(r.getAttributeValue(null, "r")).getOrElse("")
                cellCol = if (ref.nonEmpty) colIndex(ref)
                  else cur.keys.foldLeft(-1)(math.max) + 1
                cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
                sb.clear()
              case "v" => collecting = true
              case "t" if cellType == "inlineStr" => collecting = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (collecting) sb.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "v" => collecting = false
              case "t" => collecting = false
              case "c" =>
                if (cellCol >= 0) {
                  val raw = sb.toString
                  val value = cellType match {
                    case "s" =>
                      val i = raw.trim.toInt
                      if (i >= 0 && i < sst.length) sst(i) else ""
                    case _ => raw
                  }
                  if (value.nonEmpty) cur(cellCol) = value
                }
                cellCol = -1
                cellType = ""
              case "row" =>
                val width = cur.keys.foldLeft(-1)(math.max) + 1
                rows += (0 until width).map(i => cur.getOrElse(i, ""))
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    rows.toSeq
  }

  /** Parse one .xlsx byte blob: the 1-based `sheet`'s rows as cell
    * strings ("" = empty cell). */
  private[graft] def parseWorkbook(bytes: Array[Byte], sheet: Int)
      : Seq[Seq[String]] = {
    val sheetPart = s"xl/worksheets/sheet$sheet.xml"
    val parts = zipParts(bytes, Set("xl/sharedStrings.xml", sheetPart))
    val sst = parts.get("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(IndexedSeq.empty)
    parts.get(sheetPart).map(parseSheet(_, sst)).getOrElse(Seq.empty)
  }

  /** Minimal .xlsx WRITER (inline strings only) — the sheet-export sink
    * (S13's dashboard-export shape, `utils/sheets.py`'s role):
    * spreadsheet TARGETS are metadata-sized by definition, so a
    * driver-side single file is the right amount of distribution; null
    * cells are omitted (sparse refs) and read back as null. */
  def writeXlsx(file: java.io.File, rows: Seq[Seq[String]]): Unit = {
    def esc(s: String) = s.replace("&", "&amp;")
      .replace("<", "&lt;").replace(">", "&gt;")
    def colRef(i: Int): String = {
      var n = i + 1
      val sb = new StringBuilder
      while (n > 0) { sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    val sheetRows = rows.zipWithIndex.map { case (cells, ri) =>
      val cs = cells.zipWithIndex.collect {
        case (v, ci) if v != null =>
          s"""<c r="${colRef(ci)}${ri + 1}" t="inlineStr"><is><t xml:space="preserve">${esc(v)}</t></is></c>"""
      }.mkString
      s"""<row r="${ri + 1}">$cs</row>"""
    }.mkString
    val parts = Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>""".stripMargin,
      "_rels/.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""".stripMargin,
      "xl/workbook.xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""".stripMargin,
      "xl/worksheets/sheet1.xml" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$sheetRows</sheetData></worksheet>""".stripMargin)
    val z = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(file))
    try parts.foreach { case (name, content) =>
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      z.closeEntry()
    } finally z.close()
  }

  /** S1 — native .xlsx scan: header = each file's first row (schema
    * probed from the lexicographically first file on the driver, the
    * bounded header-probe pattern); all columns string; "" → null.
    * Multiple files union by position, each dropping its own header
    * row. */
  def readXlsx(spark: SparkSession, path: String, sheet: Int = 1)
      : DataFrame = {
    val bin = spark.read.format("binaryFile").load(path)
      .select("path", "content")
    val first = bin.orderBy("path").select("content").head
      .getAs[Array[Byte]](0)
    val header = parseWorkbook(first, sheet).headOption
      .getOrElse(Seq.empty).map(_.trim)
    require(header.nonEmpty, s"no header row in first .xlsx under $path")
    val n = header.length
    val schema = StructType(
      header.map(StructField(_, StringType, nullable = true)))
    val rows = bin.select("content").rdd.flatMap { r =>
      parseWorkbook(r.getAs[Array[Byte]](0), sheet).drop(1).map { cells =>
        Row.fromSeq(cells.padTo(n, "").take(n)
          .map(c => if (c == null || c.isEmpty) null else c))
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** S1 — the reference's minicore-sheet semantics on NATIVE .xlsx
    * (`utils/parse.py:163-175`): header row 0, drop the two info/
    * example rows and the first (sample-number) column, keep rows with
    * a `SampleID*`, drop all-null rows — identical post-processing to
    * [[Sources.readMinicoreCsv]], no CSV conversion step required. */
  def readMinicoreXlsx(spark: SparkSession, path: String,
      idCol: String = "SampleID*", sheet: Int = 1): DataFrame = {
    val bin = spark.read.format("binaryFile").load(path)
      .select("path", "content")
    val first = bin.orderBy("path").select("content").head
      .getAs[Array[Byte]](0)
    val header = parseWorkbook(first, sheet).headOption
      .getOrElse(Seq.empty).drop(1).map(_.trim)
    require(header.nonEmpty, s"no header row in first .xlsx under $path")
    val n = header.length
    val schema = StructType(
      header.map(StructField(_, StringType, nullable = true)))
    val rows = bin.select("content").rdd.flatMap { r =>
      parseWorkbook(r.getAs[Array[Byte]](0), sheet).drop(3).map { cells =>
        Row.fromSeq(cells.drop(1).padTo(n, "").take(n)
          .map(c => if (c == null || c.isEmpty) null else c))
      }
    }
    val df = Sources.sanitizeColumns(spark.createDataFrame(rows, schema))
    import org.apache.spark.sql.functions._
    df.where(col(s"`$idCol`").isNotNull)
      .where(coalesce(df.columns.map(c => col(s"`$c`")).toIndexedSeq: _*)
        .isNotNull)
  }
}
