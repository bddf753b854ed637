package graft.sources

import graft.functions.{GeoJson, Jts}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/**
 * ST_Read analog: one entry point over the supported geo formats with
 * path-extension dispatch (the reference's replacement scans —
 * gdal/functions/st_read.cpp:598-613 — map `.shp`/`.geojson`/... to
 * the right reader). GDAL's 50+ drivers are out of scope (SURVEY §7.3);
 * supported: GeoParquet/parquet+WKB, GeoJSON (FeatureCollection or
 * newline-delimited features), Shapefile, CSV+WKT.
 */
object GeoRead {

  /** Read any supported geo format by extension. */
  def read(spark: SparkSession, path: String): DataFrame = read(spark, path, ReadOptions())

  /** ST_Read options (reference st_read.cpp:676-695): `layer` selects a
   *  multi-layer container's table; `spatialFilterBox` restricts the
   *  scan to features intersecting the box — pushed into the source
   *  where an index exists (FlatGeobuf packed R-tree), applied as an
   *  exact residual filter everywhere. */
  case class ReadOptions(
      layer: String = "",
      spatialFilterBox: Option[(Double, Double, Double, Double)] = None,
      /** WKB of an arbitrary filter geometry: only features intersecting
       *  it are returned (reference `spatial_filter`, st_read.cpp:52-62);
       *  its envelope is pushed into index-aware sources, the exact
       *  intersects stays a residual filter. */
      spatialFilter: Option[Array[Byte]] = None,
      /** Reference `keep_wkb` (st_read.cpp:676-695): expose the raw WKB
       *  column under the reference's `wkb_geometry` name instead of
       *  `geom` (our storage is already WKB, so no conversion differs —
       *  the user-visible contract is the column name + no coercion). */
      keepWkb: Boolean = false,
      /** Attribute charset override (reference GDAL ENCODING open
       *  option) — Shapefile .dbf today; empty = .cpg / format default. */
      encoding: String = "",
      /** Reference `max_batch_size`: cap on features per batch; the
       *  Spark analog sets split granularity (rows per partition). */
      maxBatchSize: Int = 0,
      /** CSV point columns as "xcol:ycol" (GDAL's X_POSSIBLE_NAMES/
       *  Y_POSSIBLE_NAMES open-option analog). Empty = WKT column, or
       *  auto-detected lon/lat / x/y pairs when no WKT column exists. */
      xy: String = "",
      /** Reference `allowed_drivers` (st_read.cpp:676-695): restrict
       *  which drivers may open the path. Our dispatch is by extension,
       *  so the check is a guard — the resolved driver's short name
       *  (see [[drivers]]) must appear in the list, else the read
       *  errors instead of opening with an unexpected driver. */
      allowedDrivers: Seq[String] = Nil,
      /** Reference `open_options`: GDAL driver KEY=VALUE pairs. The
       *  portable ones map onto our native options (ENCODING →
       *  [[ReadOptions.encoding]], X_POSSIBLE_NAMES/Y_POSSIBLE_NAMES →
       *  [[ReadOptions.xy]]); an unrecognized key errors clearly
       *  rather than being silently dropped. */
      openOptions: Map[String, String] = Map.empty,
      /** Reference `sibling_files`: the sidecar set GDAL may consult.
       *  Our sidecar discovery is path-derived (x.shp → x.shx/.dbf/
       *  .cpg/.prj — never a directory scan), so the declared siblings
       *  are validated to exist and that's the whole contract. */
      siblingFiles: Seq[String] = Nil,
      /** Reference `sequential_layer_scan` (OSM driver): accepted and
       *  a no-op — our layer lookup is already direct per container. */
      sequentialLayerScan: Boolean = false)

  def read(spark: SparkSession, path: String, opts0: ReadOptions): DataFrame = {
    // GDAL open_options fold into the native options up front (applies
    // identically on the zip / directory recursion paths)
    val opts = applyOpenOptions(path, opts0)
    // Zipped inputs (GDAL /vsizip/ parity — reference st_read open_options
    // and test/sql/gdal vsi/zip cases): `archive.zip` sniffs the single
    // contained dataset, `archive.zip/inner.shp` selects an entry. The
    // archive extracts once to a local temp dir (zip is not splittable;
    // sidecars — .shx/.dbf/.prj/.cpg — come along), then the normal
    // reader runs on the extracted file. The `.zip` segment is treated
    // as an archive only when it IS a regular file on disk — a real
    // DIRECTORY named `tiles.zip/` falls through to the normal path.
    // (locally: a bare block after the val above would parse as a
    // block ARGUMENT to the preceding call)
    locally {
      // .kmz is a zipped KML by definition (GDAL LIBKML opens it
      // natively — reference st_read.cpp:668-702); it rides the same
      // extraction, with doc.kml as the conventional root entry
      val zi = Seq(path.toLowerCase.indexOf(".zip"), path.toLowerCase.indexOf(".kmz"))
        .filter(_ >= 0).minOption.getOrElse(-1)
      if (zi >= 0 && (path.length == zi + 4 || path.charAt(zi + 4) == '/')) {
        val archive = path.substring(0, zi + 4)
        if (new java.io.File(archive).isFile) {
          // the extraction lands on the DRIVER's local filesystem;
          // executors on a non-local cluster cannot see it — enforce
          // the declared limit instead of returning empty scans
          if (!spark.sparkContext.isLocal)
            throw new UnsupportedOperationException(
              s"st_read('$path'): zipped inputs extract to the driver's local " +
                "temp dir, which a non-local cluster's executors cannot read. " +
                "Unzip to shared storage (or read the archive on a local session) first.")
          val inner = if (path.length > zi + 5) path.substring(zi + 5) else ""
          return read(spark, extractZip(archive, inner), opts)
        }
      }
    }
    // a DIRECTORY of single-file containers (.shp / .fgb) reads as the
    // union of its files — the realistic shape of a large delivered
    // dataset (thousands of tiles); each file keeps its own parallel
    // splitter, the union is plan-level (no data movement)
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a .gdb DIRECTORY is one container (OpenFileGDB), not a tile dir
    if (fs.isDirectory(hPath) && !path.toLowerCase.stripSuffix("/").endsWith(".gdb")) {
      // strip the file: scheme for the local-file readers (RandomAccessFile)
      val files = fs.listStatus(hPath).map { st =>
        val p = st.getPath
        if (p.toUri.getScheme == "file") p.toUri.getPath else p.toString
      }.sorted
      val exts = Seq(".shp", ".fgb", ".geojson", ".gpx", ".kml", ".mif", ".dxf", ".gmt", ".topojson")
      val byExt = exts.map(e => e -> files.filter(_.toLowerCase.endsWith(e)))
        .filter(_._2.nonEmpty)
      if (byExt.length > 1)
        throw new IllegalArgumentException(
          s"directory $path mixes formats (${byExt.map(_._1).mkString(", ")}); " +
            "read each format separately")
      byExt.headOption.foreach { case (_, members) =>
        return members.map(f => read(spark, f, opts)).reduce(_ unionByName _)
      }
    }
    val lower = path.toLowerCase
    // allowed_drivers guard: the extension-resolved driver must be on
    // the caller's list (reference st_read.cpp:676-695 — GDAL refuses
    // to open with a driver outside ALLOWED_DRIVERS)
    if (opts.allowedDrivers.nonEmpty) {
      val drv = driverOf(lower)
      val allowed = opts.allowedDrivers.map(_.trim.toLowerCase).filter(_.nonEmpty)
      if (!allowed.contains(drv))
        throw new IllegalArgumentException(
          s"st_read('$path'): resolved driver '$drv' is not in " +
            s"allowed_drivers (${allowed.mkString(", ")})")
    }
    // sibling_files: our sidecar discovery is path-derived, never a
    // directory scan, so the contract here is existence validation of
    // the declared set (relative names resolve beside the main file)
    if (opts.siblingFiles.nonEmpty) {
      val parent = hPath.getParent
      opts.siblingFiles.foreach { sib =>
        val sp = new org.apache.hadoop.fs.Path(sib)
        val resolved = if (sp.isAbsolute) sp else new org.apache.hadoop.fs.Path(parent, sib)
        if (!fs.exists(resolved))
          throw new IllegalArgumentException(
            s"st_read('$path'): declared sibling file not found: $resolved")
      }
    }
    // bbox used for source-level pushdown: the explicit box, else the
    // filter geometry's envelope
    val pushBox: Option[(Double, Double, Double, Double)] =
      opts.spatialFilterBox.orElse(opts.spatialFilter.map { wkb =>
        val env = graft.functions.Jts.read(wkb).getEnvelopeInternal
        (env.getMinX, env.getMinY, env.getMaxX, env.getMaxY)
      })
    // each source declares its geometry column — never guessed from the
    // schema (a data BLOB column must not be mistaken for geometry)
    val (df, geomCol): (DataFrame, Option[String]) =
      if (lower.endsWith(".osm.pbf") || lower.endsWith(".pbf"))
        (OsmPbf.read(spark, path), None) // lat/lon columns, no WKB geometry
      else if (lower.endsWith(".shp"))
        (Shapefile.read(spark, path, encoding = opts.encoding,
          maxBatchSize = opts.maxBatchSize), Some("geom"))
      else if (lower.endsWith(".fgb"))
        // index pushdown: candidates by stored bbox, exact filter below
        (FlatGeobuf.read(spark, path, bbox = pushBox,
          maxBatchSize = opts.maxBatchSize), Some("geom"))
      else if (lower.endsWith(".gpkg")) {
        val gc = GeoPackage.layers(spark, path)
          .find(l => opts.layer.isEmpty || l._1 == opts.layer).map(_._2)
        (GeoPackage.read(spark, path, opts.layer), gc)
      }
      else if (lower.endsWith(".topojson"))
        (TopoJson.read(spark, path), Some("geom"))
      else if (lower.endsWith(".geojson") || lower.endsWith(".json"))
        (readGeoJson(spark, path), Some("geom"))
      else if (lower.endsWith(".parquet")) {
        val p = spark.read.parquet(path)
        // GeoParquet: primary column from the `geo` footer when present
        val fromMeta = GeoParquetMeta.readGeoMetadata(path).flatMap { json =>
          "\"primary_column\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(json).map(_.group(1))
        }
        (p, fromMeta.orElse(p.schema.fields.find(f =>
          f.dataType == BinaryType && Seq("geom", "geometry", "wkb_geometry")
            .contains(f.name.toLowerCase)).map(_.name)))
      }
      else if (lower.endsWith(".csv"))
        (readCsvWkt(spark, path, xyColumns = opts.xy), Some("geom"))
      else if (lower.endsWith(".geojsonl") || lower.endsWith(".ndjson"))
        (readGeoJson(spark, path), Some("geom"))
      else if (lower.endsWith(".gpx"))
        (Gpx.read(spark, path, if (opts.layer.nonEmpty) opts.layer else "waypoints"),
          Some("geom"))
      else if (lower.endsWith(".kml")) (Kml.read(spark, path), Some("geom"))
      else if (lower.endsWith(".gml")) (Gml.read(spark, path), Some("geom"))
      else if (lower.endsWith(".mif")) (MapInfoMif.read(spark, path), Some("geom"))
      else if (lower.endsWith(".dxf")) (Dxf.read(spark, path), Some("geom"))
      else if (lower.endsWith(".gmt")) (Gmt.read(spark, path), Some("geom"))
      else if (lower.stripSuffix("/").endsWith(".gdb"))
        (OpenFileGdb.read(spark, path.stripSuffix("/"), opts.layer), Some("geom"))
      else if (lower.endsWith(".sqlite"))
        (Spatialite.read(spark, path, opts.layer), Some("geom"))
      else if (lower.endsWith(".xlsx")) (Xlsx.read(spark, path), None)
      else throw new IllegalArgumentException(
        s"unsupported format for $path (supported: .shp, .fgb, .gpkg, .geojson/.geojsonl/.ndjson, .parquet, .csv, .osm.pbf, .gpx, .kml, .gml, .mif, .dxf, .gmt, .gdb, .sqlite, .topojson, .xlsx)")
    val filtered = (opts.spatialFilter, opts.spatialFilterBox, geomCol) match {
      case (Some(wkb), _, Some(gc)) =>
        import graft.GeoFunctions._
        df.filter(st_intersects(col(gc), st_geomfromwkb(lit(wkb))))
      case (None, Some((x0, y0, x1, y1)), Some(gc)) =>
        import graft.GeoFunctions._
        df.filter(st_intersects(col(gc),
          st_makeenvelope(lit(x0), lit(y0), lit(x1), lit(y1))))
      case (f, b, None) if f.isDefined || b.isDefined =>
        // never silently return an unfiltered full scan
        throw new IllegalArgumentException(
          s"spatial_filter is not supported for $path: the source has no WKB geometry column")
      case _ => df
    }
    // keep_wkb: expose the WKB under the reference's column name
    geomCol match {
      case Some(gc) if opts.keepWkb => filtered.withColumnRenamed(gc, "wkb_geometry")
      case _ => filtered
    }
  }

  /** Driver short name ([[drivers]] table) for a lower-cased path. */
  private[sources] def driverOf(lower: String): String =
    if (lower.endsWith(".osm.pbf") || lower.endsWith(".pbf")) "osm_pbf"
    else if (lower.endsWith(".shp")) "shapefile"
    else if (lower.endsWith(".fgb")) "flatgeobuf"
    else if (lower.endsWith(".gpkg")) "geopackage"
    else if (lower.endsWith(".topojson")) "topojson"
    else if (lower.endsWith(".geojson") || lower.endsWith(".json") ||
      lower.endsWith(".geojsonl") || lower.endsWith(".ndjson")) "geojson"
    else if (lower.endsWith(".parquet")) "parquet"
    else if (lower.endsWith(".csv")) "csv_wkt"
    else if (lower.endsWith(".gpx")) "gpx"
    else if (lower.endsWith(".kml")) "kml"
    else if (lower.endsWith(".gml")) "gml"
    else if (lower.endsWith(".mif")) "mapinfo_mif"
    else if (lower.endsWith(".dxf")) "dxf"
    else if (lower.endsWith(".gmt")) "ogr_gmt"
    else if (lower.stripSuffix("/").endsWith(".gdb")) "openfilegdb"
    else if (lower.endsWith(".sqlite")) "sqlite"
    else if (lower.endsWith(".xlsx")) "xlsx"
    else throw new IllegalArgumentException(
      s"unsupported format for $lower (see st_drivers() for the supported list)")

  /** Fold GDAL `open_options` KEY=VALUE pairs into the native options.
   *  Portable keys map 1:1; anything else errors (an option the engine
   *  would silently drop is worse than a clear refusal). Idempotent —
   *  safe on the zip/directory recursion paths. */
  private def applyOpenOptions(path: String, opts: ReadOptions): ReadOptions = {
    if (opts.openOptions.isEmpty) return opts
    var o = opts
    val norm = opts.openOptions.map { case (k, v) => (k.trim.toUpperCase, v.trim) }
    norm.foreach { case (k, v) =>
      k match {
        case "ENCODING" => o = o.copy(encoding = v)
        case "X_POSSIBLE_NAMES" | "Y_POSSIBLE_NAMES" => // paired below
        case other => throw new IllegalArgumentException(
          s"st_read('$path'): unsupported open_options key '$other' " +
            "(supported: ENCODING, X_POSSIBLE_NAMES, Y_POSSIBLE_NAMES)")
      }
    }
    (norm.get("X_POSSIBLE_NAMES"), norm.get("Y_POSSIBLE_NAMES")) match {
      case (Some(x), Some(y)) => o = o.copy(xy = s"$x:$y")
      case (None, None)       =>
      case _ => throw new IllegalArgumentException(
        s"st_read('$path'): X_POSSIBLE_NAMES and Y_POSSIBLE_NAMES must be given together")
    }
    o
  }

  private val geoJsonSchema = StructType(Seq(
    StructField("properties", MapType(StringType, StringType)),
    StructField("geom", BinaryType)))

  /**
   * GeoJSON reader. Newline-delimited GeoJSON (GeoJSONSeq — the form
   * large datasets actually ship as) reads LINE-PARALLEL via a plain
   * splittable text scan: every partition parses its own lines, so a
   * 100 GB .geojsonl spreads over the cluster instead of loading one
   * 2 GB-capped JVM string in one task. Only a pretty-printed (multi-
   * line) FeatureCollection document falls back to a wholetext scan —
   * that form is inherently one JSON value.
   *
   * Properties come back as map<string,string> plus the WKB geometry —
   * schema inference over arbitrary property sets is left to the
   * caller (select + cast), keeping the scan single-pass.
   */
  def readGeoJson(spark: SparkSession, path: String): DataFrame = {
    if (isLineDelimited(spark, path)) {
      val rows = spark.read.text(path).rdd.mapPartitions { lines =>
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper() // one per task, not per row
        lines.filter(_.getString(0).trim.nonEmpty).flatMap { r =>
          expandNode(mapper.readTree(r.getString(0)), mapper)
        }
      }
      spark.createDataFrame(rows, geoJsonSchema)
    } else {
      val rows = spark.read.option("wholetext", "true").text(path).rdd.flatMap { r =>
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        expandNode(mapper.readTree(r.getString(0)), mapper)
      }
      spark.createDataFrame(rows, geoJsonSchema)
    }
  }

  /** A path is line-delimited if its first file's first non-empty line
   *  parses as a standalone JSON value (or the whole doc is one line);
   *  a pretty-printed document's first line (`{`) does not. For a
   *  directory/glob the FIRST contained file is probed — a directory of
   *  pretty-printed FeatureCollection documents must still take the
   *  wholetext path. Peeks ≤64 KiB on the driver — no Spark job. */
  private def isLineDelimited(spark: SparkSession, path: String): Boolean = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses = try fs.globStatus(hPath) catch { case _: Exception => null }
    if (statuses == null || statuses.isEmpty) return true
    // resolve the first data file behind a glob/directory
    val firstFile: org.apache.hadoop.fs.FileStatus = {
      val head = statuses.sortBy(_.getPath.toString).head
      if (!head.isDirectory) head
      else {
        val inside = fs.listStatus(head.getPath)
          .filter(s => !s.isDirectory && !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
          .sortBy(_.getPath.toString)
        if (inside.isEmpty) return true
        inside.head
      }
    }
    val in = fs.open(firstFile.getPath)
    val head = try {
      val buf = new Array[Byte](64 * 1024)
      val n = in.read(buf)
      if (n <= 0) "" else new String(buf, 0, n, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
    val firstLine = head.linesIterator.find(_.trim.nonEmpty).getOrElse("")
    if (!head.stripLineEnd.contains('\n')) true // whole doc on one line
    else
      try { new com.fasterxml.jackson.databind.ObjectMapper().readTree(firstLine); true }
      catch { case _: Exception => false }
  }

  /** Expand one parsed GeoJSON value into feature rows: a
   *  FeatureCollection yields its features, a Feature itself, a bare
   *  geometry a propertyless feature. */
  private def expandNode(
      root: com.fasterxml.jackson.databind.JsonNode,
      mapper: com.fasterxml.jackson.databind.ObjectMapper): Iterator[Row] = {
    // ESRI JSON FeatureSet (ArcGIS REST; GDAL's read-only ESRIJSON
    // driver shares the .json extension with GeoJSON, so dispatch is
    // by CONTENT): no "type" key, features carry "attributes" instead
    // of "properties", geometries are the x/points/paths/rings forms
    val isEsri = !root.has("type") && root.has("features") &&
      root.get("features").isArray &&
      (root.has("geometryType") || root.has("spatialReference") ||
        (root.get("features").size() > 0 && root.get("features").get(0).has("attributes")))
    val features: Iterator[com.fasterxml.jackson.databind.JsonNode] =
      Option(root.get("type")).map(_.asText()).getOrElse("") match {
        case "FeatureCollection" =>
          val fs = root.get("features")
          (0 until fs.size()).iterator.map(fs.get)
        case "Feature" => Iterator.single(root)
        case _ if isEsri =>
          val fs = root.get("features")
          (0 until fs.size()).iterator.map(fs.get)
        case _ => Iterator.single(mapper.createObjectNode()
          .set("geometry", root).asInstanceOf[com.fasterxml.jackson.databind.JsonNode])
      }
    features.map { f =>
      val propNode = Option(f.get("properties")).filterNot(_.isNull)
        .orElse(Option(f.get("attributes")).filterNot(_.isNull))
      val props = propNode.map { p =>
        val it = p.properties().iterator()
        val m = scala.collection.mutable.LinkedHashMap[String, String]()
        while (it.hasNext) {
          val e = it.next()
          m(e.getKey) = if (e.getValue.isTextual) e.getValue.asText() else e.getValue.toString
        }
        m.toMap
      }.getOrElse(Map.empty[String, String])
      val geomNode = Option(f.get("geometry")).filterNot(_.isNull)
      val wkb = geomNode.map { g =>
        if (graft.functions.EsriJson.looksLike(g)) Jts.write(graft.functions.EsriJson.parse(g))
        else Jts.write(GeoJson.parse(g.toString))
      }.orNull
      Row(props, wkb)
    }
  }

  /** CSV with a WKT geometry column (header required; column named
   *  `wkt`, `geom`, `geometry`, or pass explicitly). */
  def readCsvWkt(spark: SparkSession, path: String, wktColumn: String = "",
      xyColumns: String = ""): DataFrame = {
    val raw = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    def lowerMap = raw.columns.map(c => c.toLowerCase -> c).toMap
    if (xyColumns.nonEmpty) {
      // explicit "xcol:ycol" (GDAL X_POSSIBLE_NAMES/Y_POSSIBLE_NAMES)
      val Array(xc, yc) = xyColumns.split(":", 2).map(_.trim)
      require(raw.columns.contains(xc) && raw.columns.contains(yc),
        s"xy columns '$xc'/'$yc' not in ${raw.columns.mkString(",")}")
      return raw.withColumn("geom", graft.GeoFunctions.st_point(
        col(xc).cast("double"), col(yc).cast("double"))).drop(xc, yc)
    }
    val wktCol = if (wktColumn.nonEmpty) Some(wktColumn)
      else raw.columns.find(c => Seq("wkt", "geom", "geometry").contains(c.toLowerCase))
    wktCol match {
      case Some(gc) =>
        raw.withColumn("geom", graft.GeoFunctions.st_geomfromtext(col(gc))).drop(gc)
      case None =>
        // point-CSV auto-detect, GDAL-style candidate pairs
        val pair = Seq(("lon", "lat"), ("longitude", "latitude"), ("x", "y"))
          .collectFirst { case (x, y) if lowerMap.contains(x) && lowerMap.contains(y) =>
            (lowerMap(x), lowerMap(y)) }
        val (xc, yc) = pair.getOrElse(throw new IllegalArgumentException(
          "no WKT column (wkt/geom/geometry) or point columns (lon/lat, x/y) found"))
        raw.withColumn("geom", graft.GeoFunctions.st_point(
          col(xc).cast("double"), col(yc).cast("double"))).drop(xc, yc)
    }
  }

  /** CSV writer: geometry re-expressed as a WKT text column (named
   *  `wkt` so readCsvWkt auto-detects it), other columns as-is;
   *  cluster-parallel via the Spark csv sink. */
  def writeCsvWkt(df: DataFrame, geomCol: String, path: String): Unit = {
    val others = df.columns.filter(_ != geomCol).map(col)
    df.select(others :+ graft.GeoFunctions.st_astext(col(geomCol)).as("wkt"): _*)
      .write.mode("overwrite").option("header", "true").csv(path)
  }

  private def localDf(spark: SparkSession, schema: StructType, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[Row](rows.asJava), schema)

  /** Dataset extensions st_read can open out of a zip (sidecar files
   *  like .shx/.dbf are extracted but never the dataset root). */
  private val ZipDataExts =
    Seq(".shp", ".fgb", ".gpkg", ".geojson", ".json", ".csv", ".parquet", ".osm.pbf", ".kml")

  /** Extract `archive` into a temp dir keyed by (path, mtime) — repeat
   *  reads of the same archive reuse the extraction — and return the
   *  path of the dataset entry: `inner` when given, else the single
   *  data-extension entry (ambiguity is an error naming the entries). */
  private def extractZip(archive: String, inner: String): String = {
    val zf = new java.util.zip.ZipFile(archive)
    try {
      val entries = {
        val b = Seq.newBuilder[java.util.zip.ZipEntry]
        val en = zf.entries()
        while (en.hasMoreElements) { val e = en.nextElement(); if (!e.isDirectory) b += e }
        b.result()
      }
      entries.foreach { e =>
        require(!e.getName.split('/').contains(".."), s"$archive: unsafe entry ${e.getName}")
      }
      val targetName: String =
        if (inner.nonEmpty)
          entries.find(_.getName == inner).map(_.getName)
            .orElse( // inner may name a zipped .gdb DIRECTORY
              entries.find(_.getName.startsWith(inner.stripSuffix("/") + "/")).map(_ => inner))
            .getOrElse(throw new IllegalArgumentException(
              s"$archive has no entry '$inner' (entries: ${entries.map(_.getName).mkString(", ")})"))
        else entries.filter(e => ZipDataExts.exists(e.getName.toLowerCase.endsWith)) match {
          case Seq(one) => one.getName
          // LIBKML convention: a KMZ's root document is doc.kml; other
          // .kml entries are linked overlays, not separate datasets
          case many if many.exists(_.getName.equalsIgnoreCase("doc.kml")) => "doc.kml"
          case Seq() =>
            // a zipped .gdb DIRECTORY (GDAL /vsizip parity): the
            // dataset is the unique *.gdb/ prefix, not a single entry
            entries.map(_.getName).flatMap { n =>
              val i = n.toLowerCase.indexOf(".gdb/")
              if (i >= 0) Some(n.substring(0, i + 4)) else None
            }.distinct match {
              case Seq(one) => one
              case _ => throw new IllegalArgumentException(
                s"$archive contains no supported dataset (entries: ${entries.map(_.getName).mkString(", ")})")
            }
          case many => throw new IllegalArgumentException(
            s"$archive contains multiple datasets (${many.map(_.getName).mkString(", ")}); " +
              s"select one as '$archive/<entry>'")
        }
      val f = new java.io.File(archive)
      val key = java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(f.getAbsolutePath).toLong * 31 + f.lastModified())
      val dir = new java.io.File(System.getProperty("java.io.tmpdir"), s"graft-zip-$key")
      if (!dir.isDirectory) {
        // extract into a process-unique staging dir, then atomically
        // rename into the shared (path, mtime)-keyed location: a reader
        // either sees the complete extraction or none of it. Two
        // concurrent sessions both extract; the rename loser just
        // discards its staging copy — no interleaved/partial dataset.
        val tmp = java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")), "graft-zip-stage-")
        entries.foreach { e =>
          val out = new java.io.File(tmp.toFile, e.getName)
          out.getParentFile.mkdirs()
          val in = zf.getInputStream(e)
          try java.nio.file.Files.copy(in, out.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          finally in.close()
        }
        try java.nio.file.Files.move(tmp, dir.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.FileAlreadyExistsException |
               _: java.nio.file.AccessDeniedException |
               _: java.nio.file.DirectoryNotEmptyException =>
            // lost the race to a concurrent extractor — its complete
            // copy is in place; drop the staging dir
            org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
        }
      }
      new java.io.File(dir, targetName).getPath
    } finally zf.close()
  }

  /** `st_table_stats(path[, geom_col])`: per-file row/byte/bbox stats
   *  of a (Hilbert-clustered) geo table, read from parquet footers only
   *  — the introspection analog of the reference's rtree_index_dump
   *  (rtree_index_pragmas.cpp:135-230). Lets a user see WHY
   *  [[graft.plans.SpatialFilterRule]] did or didn't skip files: each
   *  row is one prunable unit with its bbox. */
  def tableStats(spark: SparkSession, path: String, geomCol: String = "geom"): DataFrame =
    localDf(spark, StructType(Seq(
      StructField("file_name", StringType), StructField("row_count", LongType),
      StructField("size_bytes", LongType), StructField("row_groups", IntegerType),
      StructField("min_x", DoubleType), StructField("min_y", DoubleType),
      StructField("max_x", DoubleType), StructField("max_y", DoubleType))),
      GeoParquetMeta.tableStats(path, geomCol).map { case (name, rows, bytes, rgs, bbox) =>
        Row(name, rows, bytes, rgs,
          bbox.map(b => Double.box(b._1)).orNull, bbox.map(b => Double.box(b._2)).orNull,
          bbox.map(b => Double.box(b._3)).orNull, bbox.map(b => Double.box(b._4)).orNull)
      })

  /** Single source of truth for [[drivers]] AND the q_drivers oracle
   *  (SparkEntry generates its VALUES list from this seq, so adding a
   *  driver can never desync the gate — the r8 q_list_crs lesson
   *  applied to this catalog). */
  val driverRows: Seq[(String, String, Boolean, Boolean)] = Seq(
    ("parquet", "GeoParquet / Parquet with WKB", true, true),
    ("geojson", "GeoJSON (FeatureCollection / newline-delimited) + ESRI JSON FeatureSet (content-sniffed)", true, true),
    ("shapefile", "ESRI Shapefile (.shp/.shx/.dbf/.cpg)", true, true),
    ("flatgeobuf", "FlatGeobuf (.fgb, splittable via spatial index)", true, true),
    ("geopackage", "GeoPackage (.gpkg, SQLite container)", true, true),
    ("csv_wkt", "CSV with WKT geometry column", true, true),
    ("osm_pbf", "OpenStreetMap PBF (.osm.pbf)", true, false),
    ("gpx", "GPS Exchange Format (.gpx; waypoints/routes/tracks layers)", true, true),
    ("kml", "Keyhole Markup Language (.kml, placemark rows)", true, true),
    ("gml", "Geography Markup Language (.gml, feature-member rows)", true, true),
    ("mapinfo_mif", "MapInfo Interchange (.mif/.mid pair)", true, true),
    ("dxf", "AutoCAD DXF (ENTITIES section, entity-per-row)", true, true),
    ("ogr_gmt", "GMT ASCII Vectors (.gmt)", true, true),
    ("openfilegdb", "ESRI File Geodatabase (.gdb directory)", true, true),
    ("sqlite", "SQLite / SpatiaLite (.sqlite, Gaia geometry blobs)", true, true),
    ("topojson", "TopoJSON (.topojson, shared-arc topology)", true, true),
    ("xlsx", "MS Office Open XML spreadsheet (.xlsx, attribute rows)", true, true),
    ("pgdump", "PostgreSQL SQL dump (.sql, PostGIS COPY; write-only like GDAL's PGDump)", false, true))

  /** ST_Drivers analog: the formats this engine reads/writes. */
  def drivers(spark: SparkSession): DataFrame =
    localDf(spark, StructType(Seq(
      StructField("short_name", StringType), StructField("long_name", StringType),
      StructField("can_open", BooleanType), StructField("can_create", BooleanType))),
      driverRows.map(t => Row(t._1, t._2, t._3, t._4)))

  /** ST_List_Proj_CRS analog (reference proj/functions.cpp:380-430):
   *  dump of the supported CRS catalog with the reference's columns. */
  def listProjCrs(spark: SparkSession): DataFrame =
    localDf(spark, StructType(Seq(
      StructField("auth_name", StringType), StructField("code", StringType),
      StructField("name", StringType), StructField("type", StringType),
      StructField("deprecated", BooleanType), StructField("area_name", StringType),
      StructField("projection_method_name", StringType),
      StructField("celestial_body_name", StringType))),
      graft.functions.Crs.listAll().map(t =>
        Row(t._1, t._2, t._3, t._4, t._5, t._6, t._7, t._8)))

  /** ST_Read_Meta analog: per-file metadata — driver, schema, layer
   *  list, and feature count where the format stores one (reference
   *  returns layers LIST(STRUCT(name, feature_count, …)) —
   *  st_read_meta.cpp:26-91). */
  // reference-shaped nested metadata schema (st_read_meta.cpp:26-56):
  // layers LIST(STRUCT(name, feature_count, geometry_fields, fields))
  private val crsStruct = StructType(Seq(
    StructField("name", StringType), StructField("auth_name", StringType),
    StructField("auth_code", StringType), StructField("wkt", StringType),
    StructField("proj4", StringType), StructField("projjson", StringType)))
  private val geomFieldStruct = StructType(Seq(
    StructField("name", StringType), StructField("type", StringType),
    StructField("nullable", BooleanType), StructField("crs", crsStruct)))
  private val stdFieldStruct = StructType(Seq(
    StructField("name", StringType), StructField("type", StringType),
    StructField("subtype", StringType), StructField("nullable", BooleanType),
    StructField("unique", BooleanType), StructField("width", LongType),
    StructField("precision", LongType)))
  private val layerStruct = StructType(Seq(
    StructField("name", StringType), StructField("feature_count", LongType),
    StructField("geometry_fields", ArrayType(geomFieldStruct)),
    StructField("fields", ArrayType(stdFieldStruct))))
  val readMetaSchema: StructType = StructType(Seq(
    StructField("file_name", StringType),
    StructField("driver_short_name", StringType),
    StructField("driver_long_name", StringType),
    StructField("layers", ArrayType(layerStruct))))

  private def crsRow(name: String, auth: String, code: String, wkt: String): Row = {
    // proj4 derives from the WKT when the projection is in the
    // supported set (reference fills this via GDAL OSR; ours via
    // Crs.wktToProj4, which round-trips through the proj-string
    // parser onto the same transform)
    val proj4 =
      if (wkt.trim.nonEmpty) graft.functions.Crs.wktToProj4(wkt).getOrElse("")
      // code-only sources (gpkg srs_id, geojson default): the canonical
      // proj4 for the ubiquitous codes, like OSR exporting from EPSG
      else if (code == "4326" || name == "WGS 84") "+proj=longlat +datum=WGS84 +no_defs"
      else if (code == "3857" || code == "900913") "+proj=webmerc +datum=WGS84 +units=m +no_defs"
      else ""
    // projjson composes through the same proj4 the transform engine
    // parses (reference fills both via GDAL OSR, st_read_meta.cpp:26-91)
    val projjson =
      if (proj4.isEmpty) ""
      else graft.functions.Crs.proj4ToProjJson(proj4).getOrElse("")
    Row(name, auth, code, wkt, proj4, projjson)
  }
  private def geomField(name: String, typ: String, crs: Row): Row = Row(name, typ, true, crs)
  private def stdField(name: String, typ: String, subtype: String = "",
      width: Long = 0L, precision: Long = 0L, unique: Boolean = false): Row =
    Row(name, typ, subtype, true, unique, width, precision)

  private def baseName(path: String): String = {
    val f = new java.io.File(path).getName
    val dot = f.lastIndexOf('.')
    if (dot > 0) f.substring(0, dot) else f
  }

  def readMeta(spark: SparkSession, path: String): DataFrame = {
    // zipped inputs (incl. .kmz) extract exactly like st_read's path
    locally {
      val zi = Seq(path.toLowerCase.indexOf(".zip"), path.toLowerCase.indexOf(".kmz"))
        .filter(_ >= 0).minOption.getOrElse(-1)
      if (zi >= 0 && (path.length == zi + 4 || path.charAt(zi + 4) == '/')) {
        val archive = path.substring(0, zi + 4)
        if (new java.io.File(archive).isFile) {
          val inner = if (path.length > zi + 5) path.substring(zi + 5) else ""
          return readMeta(spark, extractZip(archive, inner))
        }
      }
    }
    val lower = path.toLowerCase
    def sparkFields(schema: StructType, geomCols: Set[String]): Seq[Row] =
      schema.fields.filterNot(f => geomCols(f.name))
        .map(f => stdField(f.name, f.dataType.simpleString)).toSeq

    val (driver, layers): (String, Seq[Row]) =
      if (lower.endsWith(".shp")) {
        val (geomType, count, dbfFields) = Shapefile.metaOf(path)
        val prj = new java.io.File(path.replaceAll("\\.[sS][hH][pP]$", "") + ".prj")
        val wkt = if (prj.isFile)
          new String(java.nio.file.Files.readAllBytes(prj.toPath), "UTF-8").trim else ""
        val fields = dbfFields.map { case (name, typ, len, dec) =>
          val (t, sub) = typ match {
            case 'N' if dec == 0 && len < 19 => ("Integer64", "")
            case 'N' | 'F' => ("Real", "")
            case 'L' => ("Integer", "Boolean")
            case 'D' => ("Date", "")
            case _ => ("String", "")
          }
          stdField(name, t, sub, len.toLong, dec.toLong)
        }
        ("shapefile", Seq(Row(baseName(path), count,
          Seq(geomField("geom", geomType, crsRow("", "", "", wkt))), fields)))
      } else if (lower.endsWith(".fgb")) {
        val (h, s) = FlatGeobuf.meta(spark, path)
        val name = if (h.name.nonEmpty) h.name else baseName(path)
        val crs = crsRow("", h.crsOrg, if (h.crsCode != 0) h.crsCode.toString else "", h.crsWkt)
        val typ = FlatGeobuf.geometryTypeName(h.geometryType) + (if (h.hasZ) " Z" else "")
        ("flatgeobuf", Seq(Row(name, h.featuresCount,
          Seq(geomField("geom", typ, crs)), sparkFields(s, Set("geom")))))
      } else if (lower.endsWith(".gpkg")) {
        ("geopackage", GeoPackage.layerMetas(spark, path).map { lm =>
          val crs = crsRow(lm.srsName, lm.srsOrg, lm.srsCode.toString, lm.srsWkt)
          val fields = lm.fields.filterNot(_._1.equalsIgnoreCase(lm.geomColumn))
            .map { case (n, declType, isRowid) => stdField(n, declType, unique = isRowid) }
          Row(lm.name, lm.featureCount,
            Seq(geomField(lm.geomColumn, lm.geomType, crs)), fields)
        })
      } else if (lower.endsWith(".parquet")) {
        val schema = spark.read.parquet(path).schema
        val geoJson = GeoParquetMeta.readGeoMetadata(path)
        val primary = geoJson.flatMap(j =>
          "\"primary_column\"\\s*:\\s*\"([^\"]*)\"".r.findFirstMatchIn(j).map(_.group(1)))
        // GeoParquet 1.1 crs is a nested PROJJSON object — a regex over
        // `[^}]*` truncates it at the first inner brace; walk balanced
        val crsTxt = geoJson.flatMap { j =>
          "\"crs\"\\s*:\\s*".r.findFirstMatchIn(j).flatMap { m =>
            val rest = j.substring(m.end)
            if (rest.startsWith("\""))
              "^\"([^\"]*)\"".r.findFirstMatchIn(rest).map(_.group(1))
            else if (rest.startsWith("{")) {
              var depth = 0; var i = 0; var end = -1
              var inStr = false; var esc = false
              while (i < rest.length && end < 0) {
                val ch = rest.charAt(i)
                if (inStr) {
                  if (esc) esc = false
                  else if (ch == '\\') esc = true
                  else if (ch == '"') inStr = false
                } else ch match {
                  case '"' => inStr = true
                  case '{' => depth += 1
                  case '}' => depth -= 1; if (depth == 0) end = i
                  case _ =>
                }
                i += 1
              }
              if (end >= 0) Some(rest.substring(0, end + 1)) else None
            } else None
          }
        }.getOrElse("")
        val crs =
          if (crsTxt.startsWith("{")) {
            // PROJJSON object: fill projjson + derived proj4 + the
            // TOP-LEVEL authority id (nested method/datum ids differ)
            val proj4 = graft.functions.Crs.projJsonToProj4Opt(crsTxt).getOrElse("")
            val (name, auth, code) =
              try {
                val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(crsTxt)
                val id = Option(node.get("id"))
                (Option(node.get("name")).map(_.asText("")).getOrElse(""),
                  id.flatMap(i => Option(i.get("authority")).map(_.asText(""))).getOrElse(""),
                  id.flatMap(i => Option(i.get("code")).map(_.asText(""))).getOrElse(""))
              } catch { case _: Exception => ("", "", "") }
            Row(name, auth, code, "", proj4, crsTxt)
          } else crsRow("", "", "", crsTxt)
        val geomCols = primary.toSet ++
          schema.fields.filter(f => f.dataType == BinaryType && f.name == "geom").map(_.name)
        ("parquet", Seq(Row(baseName(path), -1L,
          geomCols.toSeq.sorted.map(c => geomField(c, "Unknown", crs)),
          sparkFields(schema, geomCols))))
      } else if (lower.endsWith(".topojson")) {
        // TopoJSON is lon/lat by convention (the GeoJSON lineage); the
        // layer list requires a parse, which meta intentionally skips
        ("topojson", Seq(Row(baseName(path), -1L,
          Seq(geomField("geom", "Unknown", crsRow("WGS 84", "EPSG", "4326", ""))),
          Seq(stdField("layer", "string"), stdField("id", "string"),
            stdField("props", "map<string,string>")))))
      } else if (lower.endsWith(".geojson") || lower.endsWith(".json")) {
        // GeoJSON is WGS84 by spec (RFC 7946 §4)
        ("geojson", Seq(Row(baseName(path), -1L,
          Seq(geomField("geom", "Unknown", crsRow("WGS 84", "EPSG", "4326", ""))),
          Seq(stdField("properties", "map<string,string>")))))
      } else if (lower.endsWith(".gpx")) {
        // GPX is WGS84 by its schema; layer model matches GDAL's five
        val wgs = crsRow("WGS 84", "EPSG", "4326", "")
        val gTypes = Map("waypoints" -> "Point", "routes" -> "LineString",
          "tracks" -> "MultiLineString", "route_points" -> "Point",
          "track_points" -> "Point")
        ("gpx", Gpx.layers.map { l =>
          Row(l, -1L, Seq(geomField("geom", gTypes(l), wgs)),
            sparkFields(Gpx.schemaOf(l), Set("geom")))
        })
      } else if (lower.endsWith(".kml")) {
        // KML is WGS84 lon/lat by spec (OGC KML §9.1.2)
        ("kml", Seq(Row(baseName(path), -1L,
          Seq(geomField("geom", "Unknown", crsRow("WGS 84", "EPSG", "4326", ""))),
          Seq(stdField("folder", "string"), stdField("name", "string"),
            stdField("description", "string"), stdField("ext", "map<string,string>")))))
      } else if (lower.endsWith(".gml")) {
        // GML carries per-geometry srsName; surfaced as the `srs`
        // column rather than asserted at the layer level
        ("gml", Seq(Row(baseName(path), -1L,
          Seq(geomField("geom", "Unknown", crsRow("", "", "", ""))),
          Seq(stdField("layer", "string"), stdField("fid", "string"),
            stdField("srs", "string"), stdField("props", "map<string,string>")))))
      } else if (lower.endsWith(".gmt")) {
        val h = Gmt.readHeader(path)
        ("ogr_gmt", Seq(Row(baseName(path), -1L,
          Seq(geomField("geom", h.gtype.toLowerCase.capitalize, crsRow("", "", "", ""))),
          h.fields.map { case (n, t) => stdField(n, t.capitalize) })))
      } else if (lower.endsWith(".dxf")) {
        // DXF carries no CRS (drawing units); entity count is known
        // only after a full parse, which meta intentionally skips
        ("dxf", Seq(Row("entities", -1L,
          Seq(geomField("geom", "Unknown", crsRow("", "", "", ""))),
          Seq(stdField("layer", "string"), stdField("entity_handle", "string"),
            stdField("linetype", "string"), stdField("text", "string")))))
      } else if (lower.stripSuffix("/").endsWith(".gdb")) {
        ("openfilegdb", OpenFileGdb.layerMetas(path.stripSuffix("/")).map {
          case (name, count, gtype, wkt, fields) =>
            Row(name, count, Seq(geomField("geom", gtype, crsRow("", "", "", wkt))),
              fields.map { case (n, t) => stdField(n, t) })
        })
      } else if (lower.endsWith(".sqlite")) {
        ("sqlite", Spatialite.layerMetas(spark, path).map {
          case (name, gtype, srid, fields) =>
            Row(name, -1L,
              Seq(geomField("geom", gtype, crsRow("", "EPSG", srid.toString, ""))),
              fields.map { case (n, t) => stdField(n, t) })
        })
      } else ("unknown", Seq.empty[Row])

    val longName = drivers(spark).collect()
      .find(_.getString(0) == driver).map(_.getString(1)).getOrElse("")
    localDf(spark, readMetaSchema, Seq(Row(path, driver, longName, layers)))
  }

  /**
   * ST_GeneratePoints analog (reference core/functions/table/
   * st_generatepoints.cpp): `count` seeded uniform points in the box,
   * distributed via spark.range (scales to any count).
   *
   * The per-id coordinate stream is a fixed integer mixer (two
   * quadratic rounds mod 2^31-1) rather than an engine-owned PRNG, so
   * any SQL engine can replay the identical points from (bounds,
   * count, seed) alone: every intermediate stays in [0, 2^62), which
   * both Java long and a checked 64-bit SQL BIGINT hold without
   * overflow, and the final int->double division is IEEE-exact.
   */
  private val GenP = 2147483647L // 2^31 - 1

  /** u(id, j) in [0,1): j=0 for x, j=1 for y. `seedMix` is the
   *  pre-folded seed residue (see generatePoints). */
  private def genUnit(seedMix: Long, j: Int): org.apache.spark.sql.Column = {
    val s = (col("id") * 2 + lit(j.toLong) + lit(seedMix)) % GenP
    val h1 = (s * 48271L) % GenP
    val h2 = (h1 * h1 + 12345L) % GenP
    val h3 = (h2 * 69621L + 7L) % GenP
    val h4 = (h3 * h3 + 41L) % GenP
    val h5 = (h4 * 16807L) % GenP
    h5.cast(org.apache.spark.sql.types.DoubleType) / GenP.toDouble
  }

  def generatePoints(
      spark: SparkSession, minX: Double, minY: Double, maxX: Double, maxY: Double,
      count: Long, seed: Long = 42L): DataFrame = {
    val seedMix = ((seed * 1000003L) % GenP + GenP) % GenP
    spark.range(count).select(col("id"),
      graft.GeoFunctions.st_point(
        lit(minX) + lit(maxX - minX) * genUnit(seedMix, 0),
        lit(minY) + lit(maxY - minY) * genUnit(seedMix, 1)).as("point"))
  }
}

/** ST_Write analog: one entry point over the writable geo formats with
 *  path-extension dispatch — the same sugar the reference's
 *  `COPY TO (FORMAT GDAL)` provides (gdal/functions/st_write.cpp:
 *  558-569). Parquet (+`geo` metadata) and GeoJSON write cluster-
 *  parallel; .fgb/.shp are single-file formats and stream through the
 *  driver. */
object GeoWrite {
  def write(df: org.apache.spark.sql.DataFrame, path: String, geomCol: String = "geom"): Unit = {
    val lower = path.toLowerCase
    if (lower.endsWith(".parquet")) GeoTable.writeGeoParquet(df, geomCol, path)
    else if (lower.endsWith(".fgb")) FlatGeobuf.write(df, geomCol, path)
    else if (lower.endsWith(".gpkg")) GeoPackageWrite.write(df, geomCol, path)
    else if (lower.endsWith(".sqlite")) GeoPackageWrite.writeSpatialite(df, geomCol, path)
    else if (lower.stripSuffix("/").endsWith(".gdb")) GdbWrite.write(df, geomCol, path)
    else if (lower.endsWith(".xlsx")) Xlsx.write(df, path)
    else if (lower.endsWith(".shp")) Shapefile.write(df, geomCol, path)
    else if (lower.endsWith(".topojson")) TopoJson.write(df, geomCol, path)
    else if (lower.endsWith(".geojson") || lower.endsWith(".json") || lower.endsWith(".geojsonl"))
      GeoJsonWriter.write(df, geomCol, path)
    else if (lower.endsWith(".csv")) GeoRead.writeCsvWkt(df, geomCol, path)
    else if (lower.endsWith(".kml")) GeoXmlWrite.writeKml(df, geomCol, path)
    else if (lower.endsWith(".gpx")) GeoXmlWrite.writeGpx(df, geomCol, path)
    else if (lower.endsWith(".dxf")) Dxf.write(df, geomCol, path)
    else if (lower.endsWith(".gml")) Gml.write(df, geomCol, path)
    else if (lower.endsWith(".mif")) MapInfoMif.write(df, geomCol, path)
    else if (lower.endsWith(".gmt")) Gmt.write(df, geomCol, path)
    else if (lower.endsWith(".sql")) PgDump.write(df, geomCol, path)
    else throw new IllegalArgumentException(
      s"unsupported write format for $path (supported: .parquet, .fgb, .gpkg, .shp, " +
      ".geojson, .geojsonl, .csv, .kml, .gpx, .dxf, .gml, .mif, .gmt, .sql)")
  }
}

/** GeoJSON writer: one feature per row, newline-delimited (streamable,
 *  partition-parallel — a FeatureCollection wrapper would serialize
 *  through one writer). Reference writes via GDAL COPY TO
 *  (gdal/functions/st_write.cpp). */
object GeoJsonWriter {
  def write(df: DataFrame, geomCol: String, path: String): Unit = {
    import graft.GeoFunctions._
    val props = df.columns.filter(_ != geomCol)
    val propsJson = struct(props.map(col): _*)
    df.select(concat(
      lit("""{"type":"Feature","properties":"""),
      to_json(propsJson),
      lit(""","geometry":"""),
      st_asgeojson(col(geomCol)),
      lit("}")).as("value"))
      .write.mode("overwrite").text(path)
  }

  /** Single-file `{"type":"FeatureCollection","features":[...]}` form
   *  (what many GeoJSON consumers require). Features stream through the
   *  driver one at a time (toLocalIterator — single-file format, same
   *  shape as the reference's GDAL COPY TO); use `write` (NDJSON) for
   *  cluster-parallel output. */
  def writeFeatureCollection(df: DataFrame, geomCol: String, path: String): Unit = {
    DriverSink.guard(df, "FeatureCollection GeoJSON", "GeoJson NDJSON write (cluster-parallel)")
    import graft.GeoFunctions._
    val props = df.columns.filter(_ != geomCol)
    val features = df.select(concat(
      lit("""{"type":"Feature","properties":"""),
      to_json(struct(props.map(col): _*)),
      lit(""","geometry":"""),
      st_asgeojson(col(geomCol)),
      lit("}")).as("value"))
    val out = java.nio.file.Files.newBufferedWriter(java.nio.file.Paths.get(path), java.nio.charset.StandardCharsets.UTF_8)
    try {
      out.write("""{"type":"FeatureCollection","features":[""")
      val it = features.toLocalIterator()
      var first = true
      while (it.hasNext) {
        if (!first) out.write(",")
        out.write(it.next().getString(0))
        first = false
      }
      out.write("]}")
    } finally out.close()
  }
}
