package graft.sources

import graft.functions.Jts
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/**
 * PostgreSQL/PostGIS dump writer — the analog of GDAL's write-only
 * `PGDump` driver (the reference reaches it through `COPY TO ...
 * (FORMAT GDAL, DRIVER 'PGDump')`): emits one `.sql` file a stock
 * `psql -f` loads into PostGIS. Layout follows the published PGDump
 * output shape:
 *
 *   SET standard_conforming_strings = ON;
 *   CREATE TABLE "table" ("ogc_fid" SERIAL PRIMARY KEY, ...columns...);
 *   SELECT AddGeometryColumn('','table','geom',SRID,'GEOMETRY',2);
 *   COPY "table" ("col", ..., "geom") FROM stdin;
 *   <tab-separated COPY text rows; geometry as hex (E)WKB>
 *   \.
 *
 * COPY text escaping per the PostgreSQL spec: backslash, tab, newline,
 * carriage return escape; NULL is `\N`. Geometry serializes as hex
 * WKB, with the EWKB SRID header when `srid > 0` (what PostGIS's
 * binary parser ingests directly). Type mapping: string→VARCHAR,
 * int→INTEGER, long→BIGINT, float/double→FLOAT8, decimal→NUMERIC(p,s),
 * boolean→BOOLEAN, date→DATE, timestamp→TIMESTAMP, anything
 * else→VARCHAR via toString.
 *
 * Single-file text format — rows stream through the driver
 * ([[DriverSink]] guard applies); at scale, shard to many .sql files
 * or load GeoParquet/NDJSON cluster-parallel instead.
 */
object PgDump {

  private def sqlType(dt: DataType): String = dt match {
    case IntegerType | ShortType | ByteType => "INTEGER"
    case LongType => "BIGINT"
    case FloatType | DoubleType => "FLOAT8"
    // the COPY text carries the full decimal string — declare the
    // matching NUMERIC(p,s) so PostgreSQL keeps the precision
    case d: DecimalType => s"NUMERIC(${d.precision}, ${d.scale})"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case _ => "VARCHAR"
  }

  /** COPY text-format escape (PostgreSQL "Text Format" rules). */
  private def esc(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => sb.append("\\\\")
        case '\t' => sb.append("\\t")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  def write(df: DataFrame, geomCol: String, path: String,
      table: String = "layer", srid: Int = 0): Unit = {
    require(table.nonEmpty && !table.contains("\""), s"bad table name: $table")
    df.schema.fields.foreach(f => require(!f.name.contains("\""),
      s"""PGDump: column name contains a double quote: ${f.name}"""))
    DriverSink.guard(df, "PGDump", "GeoParquet + cluster-parallel load (pgloader/ogr2ogr)")
    val gi = df.schema.fieldIndex(geomCol)
    val attrs = df.schema.fields.zipWithIndex.filter(_._2 != gi)
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val w = java.nio.file.Files.newBufferedWriter(new java.io.File(path).toPath, utf8)
    // hex EWKB, NDR byte order (the PostGIS/GDAL convention): SRID
    // header when srid > 0 (PostGIS ingests directly)
    val wkbWriter = new org.locationtech.jts.io.WKBWriter(2,
      org.locationtech.jts.io.ByteOrderValues.LITTLE_ENDIAN, srid > 0)
    try {
      w.write("SET standard_conforming_strings = ON;\n")
      w.write(s"""CREATE TABLE "$table" ("ogc_fid" SERIAL PRIMARY KEY""")
      attrs.foreach { case (f, _) =>
        w.write(s""", "${f.name}" ${sqlType(f.dataType)}""")
      }
      w.write(");\n")
      w.write(s"SELECT AddGeometryColumn('','$table','$geomCol',$srid,'GEOMETRY',2);\n")
      val colList = (attrs.map { case (f, _) => "\"" + f.name + "\"" } :+
        ("\"" + geomCol + "\"")).mkString(", ")
      w.write(s"""COPY "$table" ($colList) FROM stdin;\n""")
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val row = it.next()
        val fields = attrs.map { case (f, i) =>
          if (row.isNullAt(i)) "\\N"
          else f.dataType match {
            case BooleanType => if (row.getBoolean(i)) "t" else "f"
            case _ => esc(row.get(i).toString)
          }
        }
        val geom =
          if (row.isNullAt(gi)) "\\N"
          else {
            val g = Jts.read(row.getAs[Array[Byte]](gi))
            if (srid > 0) g.setSRID(srid)
            org.locationtech.jts.io.WKBWriter.toHex(wkbWriter.write(g))
          }
        w.write((fields :+ geom).mkString("\t"))
        w.write("\n")
      }
      w.write("\\.\n")
    } finally w.close()
  }
}
