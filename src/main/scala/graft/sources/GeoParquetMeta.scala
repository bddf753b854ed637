package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, File, RandomAccessFile}

import org.apache.parquet.format.{KeyValue, Util}

/**
 * GeoParquet file metadata: stamps the standard `geo` key-value entry
 * into parquet footers so external engines (GDAL/DuckDB-spatial/Sedona/
 * GeoPandas) recognize the geometry column. Mirrors the reference's
 * writer, which tags geometry columns for interop
 * (gdal/functions/st_write.cpp:340-376); the metadata layout follows
 * the public GeoParquet 1.0.0 spec (geoparquet.org).
 *
 * Spark's parquet writer has no hook for file-level key-value metadata,
 * so we rewrite each footer in place after the write: the thrift
 * FileMetaData tail is re-serialized with the extra KeyValue — row
 * group byte offsets are untouched, so the data pages stay valid. Works
 * on any FS with random access; here implemented for local files (the
 * bench/test environment). At cluster scale the same rewrite runs as a
 * foreachPartition over file paths.
 */
object GeoParquetMeta {

  private val Magic = "PAR1".getBytes("US-ASCII")

  /** GeoParquet `geo` metadata JSON for one WKB geometry column. With
   *  `covering = true` (set when the writer emits a `<col>_bbox` struct
   *  — GeoTable.writeClustered always does) the 1.1.0 `covering.bbox`
   *  mapping is included, telling external readers (GDAL ≥3.9,
   *  GeoPandas, DuckDB-spatial) which per-row struct fields carry the
   *  bbox so THEIR row-group pruning can use the same stats ours does. */
  def geoJson(
      primaryColumn: String,
      bbox: Option[(Double, Double, Double, Double)],
      crs: Option[String],
      covering: Boolean = false): String = {
    val bboxJson = bbox.map { case (x0, y0, x1, y1) =>
      s""","bbox":[$x0,$y0,$x1,$y1]"""
    }.getOrElse("")
    // crs omitted -> consumers default to OGC:CRS84 per spec §crs.
    // GeoParquet 1.1 carries the crs as a PROJJSON OBJECT — derive it
    // from whatever text form the caller gave (code / proj4 / WKT);
    // an underivable text degrades to the legacy quoted-string form
    val crsJson = crs.map { c =>
      s""","crs":${graft.functions.Crs.anyToProjJson(c).getOrElse(jsonString(c))}"""
    }.getOrElse("")
    val coveringJson = if (!covering) "" else {
      // GeoParquet 1.1.0 requires the covering struct fields — and the
      // second path element — to be LITERALLY xmin/ymin/xmax/ymax
      // (spec §covering + its JSON schema); GeoTable.withBbox writes
      // the per-row struct with exactly those names
      val b = jsonString(primaryColumn + "_bbox")
      s""","covering":{"bbox":{"xmin":[$b,"xmin"],"ymin":[$b,"ymin"],"xmax":[$b,"xmax"],"ymax":[$b,"ymax"]}}"""
    }
    val version = if (covering) "1.1.0" else "1.0.0"
    s"""{"version":"$version","primary_column":${jsonString(primaryColumn)},""" +
      s""""columns":{${jsonString(primaryColumn)}:{"encoding":"WKB","geometry_types":[]$bboxJson$crsJson$coveringJson}}}"""
  }

  private def jsonString(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Stamp `geo` metadata into every part file of a local parquet dir
   *  (or a single file). Idempotent: replaces an existing `geo` entry. */
  def tagDirectory(
      path: String,
      primaryColumn: String,
      bbox: Option[(Double, Double, Double, Double)] = None,
      crs: Option[String] = None,
      covering: Boolean = false): Unit = {
    val json = geoJson(primaryColumn, bbox, crs, covering)
    partFiles(path).foreach { f =>
      tagFile(f, json)
      // Hadoop LocalFileSystem keeps a sibling checksum file; the
      // rewritten tail no longer matches it — drop it (raw FS reads fine)
      val crc = new File(f.getParentFile, "." + f.getName + ".crc")
      if (crc.exists()) crc.delete()
    }
  }

  private def partFiles(path: String): Seq[File] = {
    val f = new File(path)
    if (f.isFile) Seq(f)
    else Option(f.listFiles()).getOrElse(Array.empty[File])
      .filter(p => p.isFile && p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
      .toSeq
  }

  /** Rewrite one footer with the `geo` KeyValue added (local file). */
  def tagFile(file: File, json: String): Unit = {
    val raf = new RandomAccessFile(file, "rw")
    try {
      val len = raf.length()
      require(len > 12, s"$file: not a parquet file")
      raf.seek(len - 8)
      val footerLen = readLeInt(raf)
      val magic = new Array[Byte](4)
      raf.readFully(magic)
      require(java.util.Arrays.equals(magic, Magic), s"$file: missing PAR1 magic")
      val footerStart = len - 8 - footerLen
      raf.seek(footerStart)
      val footerBytes = new Array[Byte](footerLen)
      raf.readFully(footerBytes)
      val md = Util.readFileMetaData(new ByteArrayInputStream(footerBytes))
      if (md.getKey_value_metadata != null)
        md.getKey_value_metadata.removeIf(kv => kv.getKey == "geo")
      md.addToKey_value_metadata(new KeyValue("geo").setValue(json))
      val out = new ByteArrayOutputStream(footerLen + json.length + 64)
      Util.writeFileMetaData(md, out)
      val newFooter = out.toByteArray
      raf.seek(footerStart)
      raf.write(newFooter)
      writeLeInt(raf, newFooter.length)
      raf.write(Magic)
      raf.setLength(footerStart + newFooter.length + 8)
    } finally raf.close()
  }

  /** The file whose footer [[readGeoMetadata]] will read (first part
   *  file of a dir, or the file itself) — callers caching parsed
   *  metadata key on THIS file's (path, length, mtime), since a
   *  directory's own mtime does not change on in-place overwrites. */
  def footerFile(path: String): Option[File] = partFiles(path).headOption

  /** Read back the `geo` metadata JSON from the first part file. */
  def readGeoMetadata(path: String): Option[String] = {
    partFiles(path).headOption.flatMap { f =>
      val raf = new RandomAccessFile(f, "r")
      try {
        val len = raf.length()
        raf.seek(len - 8)
        val footerLen = readLeInt(raf)
        raf.seek(len - 8 - footerLen)
        val footerBytes = new Array[Byte](footerLen)
        raf.readFully(footerBytes)
        val md = Util.readFileMetaData(new ByteArrayInputStream(footerBytes))
        Option(md.getKey_value_metadata).flatMap { kvs =>
          val it = kvs.iterator()
          var found: Option[String] = None
          while (it.hasNext && found.isEmpty) {
            val kv = it.next()
            if (kv.getKey == "geo") found = Some(kv.getValue)
          }
          found
        }
      } finally raf.close()
    }
  }

  /** Parse a GeoParquet 1.1 `covering.bbox` mapping out of `geo`
   *  metadata: (primary geometry column, bbox struct column, role →
   *  struct-field name for xmin/ymin/xmax/ymax). Foreign writers may
   *  name the covering column anything (commonly plain "bbox"), so
   *  [[graft.plans.SpatialFilterRule]] feeds this mapping instead of
   *  assuming our own `<geom>_bbox` naming. Returns None unless all
   *  four roles resolve to subfields of ONE struct column (the spec's
   *  shape; a per-role column split has no stats-pruning story). */
  def parseCovering(json: String): Option[(String, String, Map[String, String])] = {
    val primary = "\"primary_column\"\\s*:\\s*\"([^\"]+)\"".r
      .findFirstMatchIn(json).map(_.group(1))
    val cov = "\"covering\"\\s*:\\s*\\{\\s*\"bbox\"\\s*:\\s*\\{([^}]*)\\}".r
      .findFirstMatchIn(json).map(_.group(1))
    for {
      p <- primary
      c <- cov
      entries = "\"(xmin|ymin|xmax|ymax)\"\\s*:\\s*\\[\\s*\"((?:[^\"\\\\]|\\\\.)*)\"\\s*,\\s*\"((?:[^\"\\\\]|\\\\.)*)\"\\s*\\]".r
        .findAllMatchIn(c)
        .map(m => m.group(1) -> ((m.group(2), m.group(3)))).toMap
      if entries.size == 4
      parents = entries.values.map(_._1).toSet
      if parents.size == 1
    } yield (p, parents.head, entries.map { case (role, (_, f)) => role -> f })
  }

  /** Per-file stats of a (clustered) geo table, from parquet FOOTERS
   *  only — no data pages are read, so dumping a 100 TB table costs one
   *  footer fetch per file. The analog of the reference's
   *  rtree_index_dump diagnostics (rtree_index_pragmas.cpp:135-230):
   *  where the reference dumps R-tree node bboxes, the Spark-native
   *  index is "Hilbert-clustered files + `<geom>_bbox` column stats",
   *  so the debuggable unit is the per-file bbox that
   *  [[graft.plans.SpatialFilterRule]] prunes against.
   *
   *  Returns (fileName, rows, bytes, rowGroups, bbox) per part file;
   *  bbox components are None when the file has no `<geom>_bbox`
   *  statistics (not written by [[GeoTable.writeClustered]]). */
  def tableStats(path: String, geomCol: String = "geom"):
      Seq[(String, Long, Long, Int, Option[(Double, Double, Double, Double)])] = {
    val bboxCol = s"${geomCol}_bbox"
    partFiles(path).sortBy(_.getName).map { f =>
      val raf = new RandomAccessFile(f, "r")
      try {
        val len = raf.length()
        raf.seek(len - 8)
        val footerLen = readLeInt(raf)
        raf.seek(len - 8 - footerLen)
        val footerBytes = new Array[Byte](footerLen)
        raf.readFully(footerBytes)
        val md = Util.readFileMetaData(new ByteArrayInputStream(footerBytes))
        // fold row-group column statistics: min over xmin/ymin mins,
        // max over xmax/ymax maxes (legacy min_x-style names accepted).
        // Presence is tracked PER COMPONENT: a footer carrying stats
        // for only some components must not surface MaxValue/MinValue
        // sentinels as real coordinates — the bbox is reported only
        // when all four components were found.
        var minX, minY = Double.MaxValue
        var maxX, maxY = Double.MinValue
        var hasMinX, hasMinY, hasMaxX, hasMaxY = false
        val rgs = md.getRow_groups
        if (rgs != null) rgs.forEach { rg =>
          rg.getColumns.forEach { cc =>
            val cmd = cc.getMeta_data
            if (cmd != null && cmd.getPath_in_schema != null &&
                cmd.getPath_in_schema.size() == 2 &&
                cmd.getPath_in_schema.get(0) == bboxCol) {
              val st = cmd.getStatistics
              if (st != null) {
                def le(b: Array[Byte]): Double =
                  java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).getDouble
                (cmd.getPath_in_schema.get(1), Option(st.getMin_value), Option(st.getMax_value)) match {
                  case ("xmin" | "min_x", Some(mn), _) => minX = math.min(minX, le(mn)); hasMinX = true
                  case ("ymin" | "min_y", Some(mn), _) => minY = math.min(minY, le(mn)); hasMinY = true
                  case ("xmax" | "max_x", _, Some(mx)) => maxX = math.max(maxX, le(mx)); hasMaxX = true
                  case ("ymax" | "max_y", _, Some(mx)) => maxY = math.max(maxY, le(mx)); hasMaxY = true
                  case _ =>
                }
              }
            }
          }
        }
        val bbox = if (hasMinX && hasMinY && hasMaxX && hasMaxY)
          Some((minX, minY, maxX, maxY)) else None
        (f.getName, md.getNum_rows,
          len, if (rgs == null) 0 else rgs.size(), bbox)
      } finally raf.close()
    }
  }

  private def readLeInt(raf: RandomAccessFile): Int = {
    val b = new Array[Byte](4)
    raf.readFully(b)
    (b(0) & 0xff) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16) | ((b(3) & 0xff) << 24)
  }

  private def writeLeInt(raf: RandomAccessFile, v: Int): Unit =
    raf.write(Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte))
}
