package graft

import graft.sources.Xlsx
import org.apache.spark.sql.functions._

/** XLSX reader/writer (reference parity: GDAL's XLSX driver roundtrip,
 *  test/sql/gdal/st_read_xlsx.test). The strong check is independent:
 *  python's stdlib zipfile + xml.etree re-reads the written package. */
class XlsxSpec extends SparkSpec {
  import spark.implicits._

  test("the reference test shape: COPY (1337, 'foobar') roundtrips") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx").toString
    val out = s"$dir/test.xlsx"
    Xlsx.write(Seq((1337L, "foobar")).toDF("i", "f"), out)
    val back = graft.sources.GeoRead.read(spark, out)
    assert(back.columns.toSeq == Seq("i", "f"))
    val r = back.collect()(0)
    assert(r.getLong(0) == 1337L && r.getString(1) == "foobar", r.toString)
  }

  test("types, nulls, escapes, and wide columns roundtrip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx2").toString
    val out = s"$dir/t.xlsx"
    val df = (1 to 300).map { i =>
      (i.toLong, if (i % 7 == 0) null else s"""n<&>"$i""", i * 0.25, i % 2 == 0)
    }.toDF("id", "name", "score", "even")
    Xlsx.write(df, out)
    val back = Xlsx.read(spark, out)
    assert(back.columns.toSeq == Seq("id", "name", "score", "even"))
    assert(back.schema.map(_.dataType.simpleString) ==
      Seq("bigint", "string", "double", "boolean"))
    assert(back.count() == 300)
    val agg = back.agg(sum("id"), count("name"), sum("score")).collect()(0)
    assert(agg.getLong(0) == (1 to 300).map(_.toLong).sum)
    assert(agg.getLong(1) == 300 - (300 / 7))
    assert(agg.getDouble(2) == (1 to 300).map(_ * 0.25).sum)
    assert(back.filter($"id" === 3).collect()(0).getString(1) == "n<&>\"3")
    assert(back.filter($"even" === true).count() == 150)
  }

  test("python stdlib zipfile + xml.etree independently reads the package") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx3").toString
    val out = s"$dir/chk.xlsx"
    Xlsx.write((1 to 50).map(i => (i.toLong, s"r$i", i * 2.0)).toDF("a", "b", "c"), out)
    val py =
      """
import zipfile, sys
import xml.etree.ElementTree as ET
NS = '{http://schemas.openxmlformats.org/spreadsheetml/2006/main}'
z = zipfile.ZipFile(sys.argv[1])
assert '[Content_Types].xml' in z.namelist() and 'xl/workbook.xml' in z.namelist()
root = ET.fromstring(z.read('xl/worksheets/sheet1.xml'))
rows = root.findall(f'{NS}sheetData/{NS}row')
assert len(rows) == 51, len(rows)
hdr = [c.find(f'{NS}is/{NS}t').text for c in rows[0].findall(f'{NS}c')]
assert hdr == ['a', 'b', 'c'], hdr
tot_a = tot_c = 0.0
for r in rows[1:]:
    cells = r.findall(f'{NS}c')
    tot_a += float(cells[0].find(f'{NS}v').text)
    assert cells[1].find(f'{NS}is/{NS}t').text.startswith('r')
    tot_c += float(cells[2].find(f'{NS}v').text)
assert tot_a == sum(range(1, 51)) and tot_c == sum(i * 2.0 for i in range(1, 51)), (tot_a, tot_c)
print('XLOK 1')
"""
    val pf = java.io.File.createTempFile("xlsxcheck", ".py")
    pf.deleteOnExit()
    java.nio.file.Files.write(pf.toPath, py.getBytes("UTF-8"))
    val o = scala.sys.process.Process(Seq("python3", pf.getAbsolutePath, out)).!!
    assert(o.contains("XLOK 1"), o)
  }

  test("shared-strings and gapped cells parse (foreign-producer shape)") {
    // hand-build a package the way Excel does: sharedStrings + gaps
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx4").toString
    val out = s"$dir/f.xlsx"
    val sheet =
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
      """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>""" +
      """<row r="2"><c r="A2"><v>10</v></c><c r="C2" t="s"><v>3</v></c></row>""" + // B2 missing
      """<row r="3"><c r="A3"><v>20</v></c><c r="B3"><v>2.5</v></c><c r="C3" t="s"><v>4</v></c></row>""" +
      """</sheetData></worksheet>"""
    val shared =
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
      """<si><t>id</t></si><si><t>val</t></si><si><t>tag</t></si><si><t>x</t></si><si><t>y</t></si></sst>"""
    val zout = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(out))
    def put(n: String, c: String): Unit = {
      zout.putNextEntry(new java.util.zip.ZipEntry(n)); zout.write(c.getBytes("UTF-8")); zout.closeEntry()
    }
    try {
      put("[Content_Types].xml", "<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/content-types\"/>")
      put("xl/workbook.xml", "<workbook/>")
      put("xl/sharedStrings.xml", shared)
      put("xl/worksheets/sheet1.xml", sheet)
    } finally zout.close()
    val back = Xlsx.read(spark, out)
    assert(back.columns.toSeq == Seq("id", "val", "tag"))
    val rows = back.orderBy("id").collect()
    assert(rows(0).getLong(0) == 10L && rows(0).isNullAt(1) && rows(0).getString(2) == "x")
    assert(rows(1).getLong(0) == 20L && rows(1).getDouble(1) == 2.5 && rows(1).getString(2) == "y")
    // mixed int/frac column infers double
    assert(back.schema("val").dataType.simpleString == "double")
  }
}
