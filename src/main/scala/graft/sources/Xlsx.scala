package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.jdk.CollectionConverters._

/**
 * XLSX attribute tables (OOXML SpreadsheetML — ECMA-376, the zip-of-XML
 * format): the reference reads AND writes .xlsx through GDAL's XLSX
 * driver (`test/sql/gdal/st_read_xlsx.test` roundtrips a COPY TO).
 * Non-spatial rows — xlsx carries no geometry; the first sheet row is
 * the header (GDAL's auto-header behavior for the roundtrip shape).
 *
 * Reader: workbook.xml for the first sheet's name, its sheetN.xml for
 * rows; cells resolve by their `r` A1 reference (gaps = NULL), shared
 * strings and inline strings both supported; per-column type inference
 * over the data rows (all-integral -> long, numeric -> double,
 * else string). Writer: a minimal single-sheet package with inline
 * strings and numeric cells — self-contained, no shared-string table.
 * Spreadsheets are driver-sized by design (single file, no splitter);
 * large tables belong in parquet.
 */
object Xlsx {

  private def xmlFactory(): XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    f
  }

  private def zipEntry(zf: java.util.zip.ZipFile, name: String): Option[Array[Byte]] =
    Option(zf.getEntry(name)).map { e =>
      val in = zf.getInputStream(e)
      try in.readAllBytes() finally in.close()
    }

  /** A1 -> 0-based column index ("A"->0, "AB"->27). */
  private[sources] def colOf(ref: String): Int = {
    var c = 0
    var i = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      c = c * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    c - 1
  }

  /** Raw cell grid of the first sheet: rows of (colIdx, typedValue). */
  private def parseSheet(sheetXml: Array[Byte], shared: IndexedSeq[String])
      : Seq[Seq[(Int, Any)]] = {
    val r = xmlFactory().createXMLStreamReader(new java.io.ByteArrayInputStream(sheetXml))
    val rows = scala.collection.mutable.ArrayBuffer[Seq[(Int, Any)]]()
    var cells = scala.collection.mutable.ArrayBuffer[(Int, Any)]()
    var inRow = false
    var cellRef = ""; var cellType = ""; var inV = false; var inIs = false
    var text = new StringBuilder
    var nextCol = 0
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "row" => inRow = true; cells = scala.collection.mutable.ArrayBuffer(); nextCol = 0
            case "c" if inRow =>
              cellRef = Option(r.getAttributeValue(null, "r")).getOrElse("")
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              text = new StringBuilder
            case "v" => inV = true
            case "is" => inIs = true
            case "t" if inIs => inV = true // inline string text node
            case _ =>
          }
          case XMLStreamConstants.CHARACTERS if inV => text.append(r.getText)
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "row" =>
              inRow = false; rows += cells.toSeq
            case "c" if inRow =>
              val col = if (cellRef.nonEmpty) colOf(cellRef) else nextCol
              nextCol = col + 1
              val raw = text.toString
              val v: Any = cellType match {
                case "s" => shared(raw.trim.toInt) // shared-string index
                case "inlineStr" | "str" => raw
                case "b" => raw.trim == "1"
                case _ => if (raw.isEmpty) null else raw // numeric text, typed later
              }
              if (v != null) cells += ((col, v))
            case "v" => inV = false
            case "t" if inIs => inV = false
            case "is" => inIs = false
            case _ =>
          }
          case _ =>
        }
      }
    } finally r.close()
    rows.toSeq
  }

  private def parseShared(bytes: Array[Byte]): IndexedSeq[String] = {
    val r = xmlFactory().createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var inSi = false; var sb = new StringBuilder; var inT = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "si" => inSi = true; sb = new StringBuilder
            case "t" if inSi => inT = true
            case _ =>
          }
          case XMLStreamConstants.CHARACTERS if inT => sb.append(r.getText)
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "si" => inSi = false; out += sb.toString
            case "t" => inT = false
            case _ =>
          }
          case _ =>
        }
      }
    } finally r.close()
    out.toIndexedSeq
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val zf = new java.util.zip.ZipFile(path)
    val (header, dataRows) = try {
      val shared = zipEntry(zf, "xl/sharedStrings.xml")
        .map(parseShared).getOrElse(IndexedSeq.empty)
      // first sheet = lowest sheet file (xl/worksheets/sheet1.xml)
      val sheetName = {
        val names = zf.entries().asIterator().asScala.map(_.getName)
          .filter(n => n.startsWith("xl/worksheets/sheet") && n.endsWith(".xml"))
          .toSeq.sorted
        names.headOption.getOrElse(
          throw new IllegalArgumentException(s"$path: no worksheet in xlsx"))
      }
      val rows = parseSheet(zipEntry(zf, sheetName).get, shared)
      require(rows.nonEmpty, s"$path: empty worksheet")
      (rows.head, rows.tail)
    } finally zf.close()

    val nCols = (header.map(_._1) ++ dataRows.flatMap(_.map(_._1))).maxOption.getOrElse(-1) + 1
    val names = (0 until nCols).map { i =>
      header.find(_._1 == i).map(v => String.valueOf(v._2)).getOrElse(s"Field${i + 1}")
    }
    // per-column inference over the data rows: long ⊂ double ⊂ string
    def cellAt(row: Seq[(Int, Any)], i: Int): Option[Any] = row.find(_._1 == i).map(_._2)
    val types = (0 until nCols).map { i =>
      val vals = dataRows.flatMap(cellAt(_, i))
      if (vals.isEmpty) StringType
      else if (vals.forall(_.isInstanceOf[Boolean])) BooleanType
      else {
        val nums = vals.map(v => scala.util.Try(String.valueOf(v).toDouble).toOption)
        if (nums.forall(_.isDefined)) {
          if (nums.flatten.forall(d => d == math.rint(d) && math.abs(d) < 9.007199254740992e15))
            LongType
          else DoubleType
        } else StringType
      }
    }
    val schema = StructType(names.zip(types).map { case (n, t) => StructField(n, t) })
    val rows = dataRows.map { row =>
      Row.fromSeq((0 until nCols).map { i =>
        cellAt(row, i).map { v =>
          types(i) match {
            case LongType => String.valueOf(v).toDouble.toLong
            case DoubleType => String.valueOf(v).toDouble
            case BooleanType => v.asInstanceOf[Boolean]
            case _ => String.valueOf(v)
          }
        }.orNull
      })
    }
    spark.createDataFrame(rows.asJava, schema)
  }

  private def xmlEscape(s: String): String = s.flatMap {
    case '&' => "&amp;"; case '<' => "&lt;"; case '>' => "&gt;"
    case '"' => "&quot;"; case c => c.toString
  }

  private def colRef(i: Int): String = {
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  def write(df: DataFrame, path: String): Unit = {
    DriverSink.guard(df, "XLSX", "GeoTable.writeGeoParquet")
    val schema = df.schema
    val sheet = new StringBuilder
    sheet.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sheet.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def strCell(ref: String, s: String): String =
      s"""<c r="$ref" t="inlineStr"><is><t>${xmlEscape(s)}</t></is></c>"""
    def numCell(ref: String, v: Double): String = {
      val txt = if (v == math.rint(v) && math.abs(v) < 9.007199254740992e15)
        v.toLong.toString else v.toString
      s"""<c r="$ref"><v>$txt</v></c>"""
    }
    sheet.append("<row r=\"1\">")
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      sheet.append(strCell(s"${colRef(i)}1", f.name))
    }
    sheet.append("</row>")
    var rowIdx = 1
    df.toLocalIterator().asScala.foreach { row =>
      rowIdx += 1
      sheet.append(s"""<row r="$rowIdx">""")
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        if (!row.isNullAt(i)) {
          val ref = s"${colRef(i)}$rowIdx"
          (row.get(i), f.dataType) match {
            case (v: java.lang.Number, LongType | IntegerType | ShortType | ByteType |
                DoubleType | FloatType | _: DecimalType) =>
              sheet.append(numCell(ref, v.doubleValue()))
            case (v: Boolean, _) => sheet.append(s"""<c r="$ref" t="b"><v>${if (v) 1 else 0}</v></c>""")
            case (v: Array[Byte], _) => // binary (e.g. WKB) -> hex text
              sheet.append(strCell(ref, v.map(b => f"${b & 0xFF}%02x").mkString))
            case (v, _) => sheet.append(strCell(ref, String.valueOf(v)))
          }
        }
      }
      sheet.append("</row>")
    }
    sheet.append("</sheetData></worksheet>")

    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" +
      """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
      """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
      """</Types>"""
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
      """</Relationships>"""
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" """ +
      """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
      """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
      """</Relationships>"""

    val zout = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    try {
      def put(name: String, content: String): Unit = {
        zout.putNextEntry(new java.util.zip.ZipEntry(name))
        zout.write(content.getBytes("UTF-8"))
        zout.closeEntry()
      }
      put("[Content_Types].xml", contentTypes)
      put("_rels/.rels", rootRels)
      put("xl/workbook.xml", workbook)
      put("xl/_rels/workbook.xml.rels", wbRels)
      put("xl/worksheets/sheet1.xml", sheet.toString)
    } finally zout.close()
  }

}
