package graft.sources

import graft.GeoFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * GeoParquet-convention table helpers. The reference's R-Tree
 * (CREATE INDEX ... USING RTREE — core/index/rtree/) maps in Spark to
 * storage-level spatial organization:
 *
 *  - a sibling `<geom>_bbox` struct column (parquet keeps min/max
 *    stats per row group on its fields → data skipping via
 *    [[graft.plans.SpatialFilterRule]])
 *  - Hilbert-clustered layout at write time (the reference's bulk
 *    index build is also a sort — rtree_index_create_logical.cpp:
 *    180-216 sorts by xmin; Hilbert order is strictly better for 2-D
 *    range queries and is what ST_Hilbert exists for)
 *
 * At 100 TB: `repartitionByRange` on the hilbert key gives
 * non-overlapping file extents, so a selective envelope query reads
 * O(matching files) instead of O(all files).
 */
object GeoTable {

  /** Add the bbox sibling column for `geomCol` (WKB). Field names are
   *  the GeoParquet 1.1 covering spec's literal xmin/ymin/xmax/ymax
   *  (not the runtime BOX_2D's min_x/…) so spec-validating external
   *  readers (GDAL ≥3.9, GeoPandas, DuckDB-spatial) accept the
   *  `covering.bbox` mapping [[GeoParquetMeta.geoJson]] advertises.
   *  The struct-to-struct cast renames positionally — the extent is
   *  computed once, not per field. */
  def withBbox(df: DataFrame, geomCol: String): DataFrame =
    df.withColumn(s"${geomCol}_bbox", st_extent(col(geomCol))
      .cast("struct<xmin:double,ymin:double,xmax:double,ymax:double>"))

  /**
   * Write a Hilbert-clustered GeoParquet table. `extent` is the global
   * bounds used to normalize the curve (compute once via
   * `df.select(st_extent_agg(col))` or pass a known CRS extent).
   */
  def writeClustered(
      df: DataFrame, geomCol: String, path: String,
      extent: (Double, Double, Double, Double),
      numFiles: Int = 0): Unit = {
    val (x0, y0, x1, y1) = extent
    val withKey = withBbox(df, geomCol)
      .withColumn("__hilbert", st_hilbert(col(geomCol), lit(x0), lit(y0), lit(x1), lit(y1)))
    val parts = if (numFiles > 0) numFiles
      else df.sparkSession.sessionState.conf.numShufflePartitions
    withKey
      .repartitionByRange(parts, col("__hilbert"))
      .sortWithinPartitions("__hilbert")
      .drop("__hilbert")
      .write.mode("overwrite").parquet(path)
    // covering=true: the table always carries <geom>_bbox, so advertise
    // the GeoParquet 1.1 covering mapping for external readers' pruning
    GeoParquetMeta.tagDirectory(path, geomCol, bbox = Some(extent), covering = true)
  }

  /** Plain (unclustered) GeoParquet write: parquet + the standard `geo`
   *  footer metadata so external engines recognize the geometry column. */
  def writeGeoParquet(
      df: DataFrame, geomCol: String, path: String,
      bbox: Option[(Double, Double, Double, Double)] = None,
      crs: Option[String] = None): Unit = {
    df.write.mode("overwrite").parquet(path)
    GeoParquetMeta.tagDirectory(path, geomCol, bbox, crs)
  }

  /**
   * Append a batch to an existing clustered table WITHOUT rewriting it
   * (the reference's R-Tree supports incremental insert via its WAL —
   * rtree_index_create_physical.cpp, test/sql/index/rtree_crud.test;
   * the clustered-layout analog is delta files). The batch is Hilbert-
   * clustered among itself, so each new file still has a tight bbox /
   * hilbert extent and data skipping keeps working — pruning degrades
   * only gradually as deltas accumulate (extents of old and new files
   * may overlap), and [[recluster]] restores the optimal layout.
   */
  def appendClustered(
      df: DataFrame, geomCol: String, path: String,
      extent: (Double, Double, Double, Double),
      numFiles: Int = 0): Unit = {
    val (x0, y0, x1, y1) = extent
    val withKey = withBbox(df, geomCol)
      .withColumn("__hilbert", st_hilbert(col(geomCol), lit(x0), lit(y0), lit(x1), lit(y1)))
    val parts = if (numFiles > 0) numFiles
      else df.sparkSession.sessionState.conf.numShufflePartitions
    stagedAppend(df.sparkSession, path) { staging =>
      withKey
        .repartitionByRange(parts, col("__hilbert"))
        .sortWithinPartitions("__hilbert")
        .drop("__hilbert")
        .write.mode("overwrite").parquet(staging)
      // tag the geo footer metadata IN STAGING, before anything is
      // visible (r16): the old whole-directory retag after move-in
      // rewrote footers of files concurrent readers were scanning —
      // and of a concurrent append's freshly moved-in files — in
      // place; identical bytes, but a reader (or the racing tagger)
      // catching a half-extended footer fails transiently. Tagging
      // only this write's staged files touches nothing anyone can see.
      GeoParquetMeta.tagDirectory(staging, geomCol,
        bbox = Some(extent), covering = true)
    }
  }

  /**
   * Logged append for ANY layout (the non-spatial twin of
   * [[appendClustered]]): the batch lands as plain parquet delta files
   * with the same staged/marker/commit concurrency shield, so the
   * commit log, change feed, and the `geotable` streaming source work
   * identically on tables that are not Hilbert-clustered (Z-ordered
   * via [[graft.operators.ZOrder.appendZOrdered]], or unclustered).
   */
  def append(df: DataFrame, path: String, numFiles: Int = 0): Unit =
    stagedAppend(df.sparkSession, path) { staging =>
      (if (numFiles > 0) df.repartition(numFiles) else df)
        .write.mode("overwrite").parquet(staging)
    }

  /**
   * The staged-append protocol shared by every logged append path
   * (clustered, z-ordered, plain): sweep dead sibling staging dirs,
   * run `writeStaged` into a fresh one, then inflight-marker →
   * move-in → commit → unmark. Every concurrency property the fuzz
   * specs pin (exact staged add sets, the marker shield over the
   * move-in→commit window, recursive-mtime staleness for the sweep)
   * lives HERE, once — a new layout gets them by passing a write
   * function, not by re-implementing the dance.
   */
  private[graft] def stagedAppend(spark: SparkSession, path: String)
      (writeStaged: String => Unit): Unit = {
    val base = path.stripSuffix("/")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hBase = new org.apache.hadoop.fs.Path(base)
    val logOn = fs.exists(hBase) && GeoTableLog.isEnabled(fs, base)
    // Stage the batch in a sibling dir, then move the EXACT file set in.
    // Two reasons (both r14 ADVICE findings): (1) the old
    // listing-diff add set could attribute a concurrent append's files
    // to this commit (writer B's files landing between A's before/after
    // listings) — the staged listing is exactly and only this write's
    // output; (2) an inflight marker naming these files protects the
    // move-in-to-commit window from a concurrent maintenance op's
    // repairRoot preamble, which reaps root files the log has never
    // seen (without the marker it would destroy this commit-to-be).
    val appendId = java.util.UUID.randomUUID.toString
    val staging = new org.apache.hadoop.fs.Path(base + ".__append-" + appendId)
    // opportunistic sweep: staging dirs of appends that died mid-write
    // (unique names, so nothing else ever cleans them). Staleness is the
    // MAX MTIME ACROSS THE DIR'S RECURSIVE CONTENTS, not the top-level
    // dir's own mtime (r15 ADVICE): during a long Spark parquet write
    // task files accumulate under `staging/_temporary/...` without
    // touching the top-level mtime, so a >10-min write would look dead
    // by the old check and a concurrent append would reap a LIVE
    // staging dir after the victim paid its full write cost. A live
    // writer keeps producing fresh task files; a dead one's whole tree
    // ages out together. The walk is file-count-sized (one staging
    // batch), driver-side metadata only.
    def maxMtime(p: org.apache.hadoop.fs.Path, own: Long): Long = {
      val st = try fs.listStatus(p) catch {
        // swept by a racing append mid-walk: report "fresh" so we skip it
        case _: java.io.FileNotFoundException => return Long.MaxValue
      }
      st.foldLeft(own) { (m, s) =>
        math.max(m, if (s.isDirectory) maxMtime(s.getPath, s.getModificationTime)
                    else s.getModificationTime)
      }
    }
    val parent = staging.getParent
    if (parent != null && fs.exists(parent)) fs.listStatus(parent).foreach { st =>
      if (st.getPath.getName.startsWith(hBase.getName + ".__append-") &&
          System.currentTimeMillis() - maxMtime(st.getPath, st.getModificationTime) >
            GeoTableLog.staleClaimMs)
        fs.delete(st.getPath, true)
    }
    writeStaged(staging.toString)
    val newParts = fs.listStatus(staging).map(_.getPath)
      .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
      .sortBy(_.getName).toSeq
    if (logOn) GeoTableLog.writeInflightMarker(fs, base, appendId, newParts.map(_.getName))
    if (!fs.exists(hBase)) fs.mkdirs(hBase)
    newParts.foreach { p =>
      // part names carry this write's task UUIDs — a destination
      // collision means a broken store, not a concurrent writer
      if (!fs.rename(p, new org.apache.hadoop.fs.Path(hBase, p.getName)))
        throw new java.io.IOException(s"stagedAppend: cannot move $p into $base")
    }
    fs.delete(staging, true)
    if (logOn) {
      GeoTableLog.appendEntry(fs, base, "append",
        add = newParts.map(_.getName), remove = Nil)
      fs.delete(new org.apache.hadoop.fs.Path(
        GeoTableLog.inflightDir(base), appendId), false)
    }
  }

  /**
   * Rewrite a clustered table into an optimal single-generation layout
   * (compaction after a run of [[appendClustered]] deltas — the analog
   * of the reference's index rebuild/vacuum). The new generation is
   * built in a sibling temp dir, the old one is renamed ASIDE before
   * the new one renames in, and only then deleted — a crash at any
   * point leaves a complete copy on disk (at `path`, `.__old`, or
   * `.__new`), never zero copies. Not transactional for concurrent
   * readers (a table format's job); same guarantee as a parquet
   * overwrite.
   */
  def recluster(
      spark: SparkSession, geomCol: String, path: String,
      extent: (Double, Double, Double, Double),
      numFiles: Int = 0): Unit = {
    val df = spark.read.parquet(path).drop(s"${geomCol}_bbox")
    val base = path.stripSuffix("/")
    val hPath = new org.apache.hadoop.fs.Path(base)
    val hNew = new org.apache.hadoop.fs.Path(base + ".__new")
    val hOld = new org.apache.hadoop.fs.Path(base + ".__old")
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(hNew, true); fs.delete(hOld, true) // stale leftovers
    val logWas = GeoTableLog.isEnabled(fs, base)
    writeClustered(df, geomCol, hNew.toString, extent, numFiles)
    if (!fs.rename(hPath, hOld))
      throw new java.io.IOException(s"recluster: cannot move $hPath aside")
    if (!fs.rename(hNew, hPath)) {
      fs.rename(hOld, hPath) // restore
      throw new java.io.IOException(s"recluster: cannot move new generation into $hPath")
    }
    fs.delete(hOld, true)
    // checkpoint semantics with the commit log: the rebuilt layout is
    // the new version 0 — history compacts away (VACUUM/index-rebuild
    // analog, documented in GeoTableLog)
    if (logWas) GeoTableLog.checkpoint(fs, base)
  }

  /**
   * Incremental delta consolidation — the OPTIMIZE-lite between
   * [[appendClustered]] and a full [[recluster]]: the files added by
   * append commits (the deltas, whose extents overlap the base
   * generation and each other) are re-clustered AMONG THEMSELVES into
   * one tight generation; every base file keeps identical bytes. At
   * 100 TB this is the maintenance shape that actually runs — a full
   * recluster rewrites the table, consolidation rewrites only the
   * (small) delta tail, and pruning quality degrades gradually again
   * until the next pass. Requires the commit log (that is what knows
   * which live files came from appends); commits op="compact"
   * (remove = old deltas, add = the consolidated files), so snapshot
   * reads of earlier versions keep working. Default output sizing:
   * one file per 128 MB of delta bytes. Returns the number of delta
   * files consolidated (0 = nothing to do).
   */
  def compactDeltas(
      spark: SparkSession, geomCol: String, path: String,
      extent: (Double, Double, Double, Double),
      numFiles: Int = 0): Int = {
    val base = path.stripSuffix("/")
    val hPath = new org.apache.hadoop.fs.Path(base)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(GeoTableLog.isEnabled(fs, base),
      s"compactDeltas requires the commit log (GeoTableLog.enable) at $base")
    // finish any swap a previous maintenance crash interrupted before
    // reading the log — the invariant below is root == latest file set
    GeoTableLog.repairRoot(fs, base)
    val es = GeoTableLog.entries(fs, base)
    val removedEver = es.flatMap(_._4).toSet
    // prior compact outputs count as deltas too — otherwise each
    // append/compact cycle would strand one more full-extent file that
    // only a full recluster could ever merge
    val deltas = es.filter(e => e._2 == "append" || e._2 == "compact")
      .flatMap(_._3).filterNot(removedEver).distinct
    if (deltas.size <= 1) return 0
    val deltaPaths = deltas.map(n => new org.apache.hadoop.fs.Path(hPath, n))
    deltaPaths.foreach(p => require(fs.exists(p), s"live delta missing: $p"))
    val bytes = deltaPaths.map(fs.getFileStatus(_).getLen).sum
    val parts = if (numFiles > 0) numFiles
      else math.max(1L, bytes / (128L * 1024 * 1024) + 1).toInt
    spark.catalog.refreshByPath(base)
    val df = spark.read.parquet(deltaPaths.map(_.toString): _*)
      .drop(s"${geomCol}_bbox")
    val staging = new org.apache.hadoop.fs.Path(base + ".__compact")
    fs.delete(staging, true)
    writeClustered(df, geomCol, staging.toString, extent, parts)
    // never-zero-copies swap order: the consolidated generation moves
    // in FIRST, the commit entry lands, and the superseded deltas
    // retire LAST. A crash anywhere in the window leaves every row
    // present (plain reads briefly double-count, committed snapshots
    // stay exact) and the repairRoot preamble of the next maintenance
    // op finishes the swap — the old retire-first order instead left
    // plain reads silently MISSING the delta rows and a re-run failing
    // on the live-delta require.
    // inflight marker around the move-in→commit window (r16,
    // fuzz-caught): without it a CONCURRENT repairRoot sees the
    // consolidated files as unknown root strays and reaps them before
    // this commit lands — the commit then references deleted files and
    // the deltas retire right after: permanent row loss. Same shield
    // appendClustered carries, same crash story (a stale marker means
    // this compact died; repairRoot reaps its files + marker).
    val staged = fs.listStatus(staging).map(_.getPath)
      .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
      .sortBy(_.getName).toSeq
    val compactId = "compact-" + java.util.UUID.randomUUID.toString
    GeoTableLog.writeInflightMarker(fs, base, compactId, staged.map(_.getName))
    val added = scala.collection.mutable.ArrayBuffer[String]()
    staged.foreach { p =>
      val dst = new org.apache.hadoop.fs.Path(hPath, p.getName)
      if (!fs.rename(p, dst))
        throw new java.io.IOException(s"compactDeltas: cannot move $p into $base")
      added += dst.getName
    }
    fs.delete(staging, true)
    GeoTableLog.appendEntry(fs, base, "compact",
      add = added.sorted.toSeq, remove = deltas.sorted)
    fs.delete(new org.apache.hadoop.fs.Path(
      GeoTableLog.inflightDir(base), compactId), false)
    deltaPaths.foreach(p => GeoTableLog.retain(fs, base, p))
    spark.catalog.refreshByPath(base)
    deltas.size
  }

  /** Finish any maintenance swap a crash interrupted (see
   *  [[GeoTableLog.repairRoot]]); safe to call anytime on a logged
   *  table. Every maintenance op also runs this as its preamble. */
  def repair(spark: SparkSession, path: String): Unit = {
    val base = path.stripSuffix("/")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    GeoTableLog.repairRoot(fs, base)
    spark.catalog.refreshByPath(base)
  }

  /**
   * Row-level DELETE on a clustered table — the reference's R-tree
   * supports transactional row CRUD through its WAL (rtree_crud.test);
   * the clustered-layout analog is SURGICAL file rewrite: only the part
   * files that actually contain matching rows are rewritten, every
   * other file's bytes are untouched. On a Hilbert-clustered table a
   * spatially selective delete therefore costs one pruned scan plus a
   * rewrite of the intersecting files — not a table rewrite — which is
   * the shape that survives 100 TB. Within-file order is preserved
   * (filter keeps order; no shuffle), so bbox tightness and skipping
   * keep working; [[recluster]] restores the optimal layout after many
   * deletes. Single-writer maintenance op like append/recluster.
   * NULL-predicate rows are kept (SQL DELETE semantics). Returns the
   * number of rows deleted.
   */
  def deleteWhere(
      spark: SparkSession, geomCol: String, path: String,
      predicate: Column): Long =
    rewriteHitFiles(spark, path, predicate, (hit, matches) => hit.filter(!matches),
      op = "delete")

  /** Non-spatial form of [[deleteWhere]] — the surgical rewrite core
   *  is layout-agnostic (it finds hit files by predicate, not
   *  geometry), so z-ordered and plain logged tables get the same
   *  row-level DELETE, commit entry included. */
  def deleteWhere(spark: SparkSession, path: String, predicate: Column): Long =
    rewriteHitFiles(spark, path, predicate, (hit, matches) => hit.filter(!matches),
      op = "delete")

  /**
   * Row-level UPDATE on a clustered table (the reference R-tree's
   * transactional UPDATE, rtree_crud.test): the same surgical rewrite
   * as [[deleteWhere]] — only the part files holding matching rows are
   * rewritten, with `set` column replacements applied to the matching
   * rows and every other row copied bit-for-bit. Geometry updates that
   * move rows far out of their file's Hilbert range degrade pruning
   * gradually (bbox stats widen); [[recluster]] restores the layout.
   * Returns the number of rows updated.
   */
  def updateWhere(
      spark: SparkSession, geomCol: String, path: String,
      predicate: Column, set: Map[String, Column]): Long = {
    require(set.nonEmpty, "updateWhere: empty SET")
    rewriteHitFiles(spark, path, predicate, { (hit, matches) =>
      val bboxCol = s"${geomCol}_bbox"
      val setsGeom = set.contains(geomCol)
      // SQL UPDATE semantics: the WHERE and every SET expression read
      // the PRE-update row. Stage the match flag and all SET values as
      // extra columns first (they all see the original columns), then
      // swap them in — a naive per-column when(predicate, value) would
      // re-evaluate the predicate against partially-updated columns
      // (e.g. SET geom = moved(geom) WHERE st_xmin(geom) < k flips the
      // predicate false before the other SET columns apply).
      val flag = "__graft_match"
      val staged = set.toSeq.zipWithIndex.foldLeft(hit.withColumn(flag, matches)) {
        case (df, ((_, value), i)) => df.withColumn(s"__graft_set_$i", value)
      }
      val applied = set.toSeq.zipWithIndex.foldLeft(staged) {
        case (df, ((name, _), i)) =>
          df.withColumn(name,
            when(col(flag), col(s"__graft_set_$i")).otherwise(col(name)))
      }
      // keep the skipping sidecar consistent with a rewritten geometry
      val bboxed =
        if (setsGeom && hit.columns.contains(bboxCol))
          applied.withColumn(bboxCol,
            when(col(flag), st_extent(col(geomCol))
              .cast("struct<xmin:double,ymin:double,xmax:double,ymax:double>"))
              .otherwise(col(bboxCol)))
        else applied
      bboxed.drop((flag +: (0 until set.size).map(i => s"__graft_set_$i")): _*)
    }, op = "update")
  }

  /** Non-spatial form of [[updateWhere]]: identical SQL UPDATE
   *  semantics (WHERE and SET read the pre-update row) without a
   *  geometry/bbox sidecar — z-ordered and plain logged tables get
   *  the same surgical row-level UPDATE, commit entry included. */
  def updateWhere(spark: SparkSession, path: String,
      predicate: Column, set: Map[String, Column]): Long =
    updateWhere(spark, "__graft_no_geom", path, predicate, set)

  /** Shared surgical-rewrite core: find the part files holding rows
   *  matching `predicate` (one scan; a file-count-sized driver list,
   *  never data-sized), apply `transform(hitRows, matches)` to ONLY
   *  those files' contents — no shuffle, so within-file Hilbert order
   *  and per-file bbox stats survive — and swap the new parts in.
   *  Untouched files keep identical bytes. Returns the match count. */
  private def rewriteHitFiles(
      spark: SparkSession, path: String, predicate: Column,
      transform: (DataFrame, Column) => DataFrame, op: String): Long = {
    val base = path.stripSuffix("/")
    val hPath = new org.apache.hadoop.fs.Path(base)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matches = coalesce(predicate, lit(false))
    // finish any swap a previous maintenance crash interrupted BEFORE
    // scanning — a stray uncommitted file would otherwise be read
    if (GeoTableLog.isEnabled(fs, base)) GeoTableLog.repairRoot(fs, base)
    spark.catalog.refreshByPath(base) // a prior rewrite may be cached
    val withFile = spark.read.parquet(base).withColumn("__file", input_file_name())
    val hits = withFile.filter(matches)
      .groupBy(col("__file")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    if (hits.isEmpty) return 0L
    val matched = hits.map(_._2).sum
    val hitFiles = hits.map(_._1)
    val staging = new org.apache.hadoop.fs.Path(base + ".__rw")
    fs.delete(staging, true)
    transform(spark.read.parquet(hitFiles.toIndexedSeq: _*), matches)
      .write.mode("overwrite").parquet(staging.toString)
    val geoJson = GeoParquetMeta.readGeoMetadata(base)
    // commit-log mode: superseded files are RETAINED (moved under
    // _graft_log/retained/) so committed snapshots stay readable — the
    // WAL/MVCC analog — and, like compactDeltas, only AFTER the new
    // parts are in and the commit entry is written (never-zero-copies:
    // a crash mid-swap leaves recoverable duplicates, not lost rows).
    // Without the log the old files are deleted first, as before.
    val logOn = GeoTableLog.isEnabled(fs, base)
    val hitPaths = hitFiles.toIndexedSeq.map(f =>
      new org.apache.hadoop.fs.Path(new java.net.URI(f)))
    if (!logOn) hitPaths.foreach { p =>
      fs.delete(p, false)
      val crc = new org.apache.hadoop.fs.Path(p.getParent, "." + p.getName + ".crc")
      if (fs.exists(crc)) fs.delete(crc, false)
    }
    val staged = fs.listStatus(staging).map(_.getPath)
      .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
      .sortBy(_.getName).toSeq
    staged.foreach { p =>
      // carry the table's geo footer metadata onto the new parts —
      // IN STAGING, before the rename (r16): an in-place footer
      // rewrite after the file is visible in the root races
      // concurrent snapshot readers
      geoJson.foreach { j =>
        val local = new java.io.File(p.toUri.getPath)
        if (local.isFile) {
          GeoParquetMeta.tagFile(local, j)
          val crc = new java.io.File(local.getParentFile, "." + local.getName + ".crc")
          if (crc.exists()) crc.delete()
        }
      }
    }
    // inflight marker over the move-in→commit window, like
    // appendClustered/compactDeltas (r16, fuzz-caught): a concurrent
    // repairRoot must not reap the rewritten parts before the commit
    val rwId = op + "-" + java.util.UUID.randomUUID.toString
    if (logOn) GeoTableLog.writeInflightMarker(fs, base, rwId, staged.map(_.getName))
    val added = scala.collection.mutable.ArrayBuffer[String]()
    staged.foreach { p =>
      val dst = new org.apache.hadoop.fs.Path(hPath, p.getName)
      if (!fs.rename(p, dst))
        throw new java.io.IOException(s"rewriteHitFiles: cannot move $p into $base")
      added += dst.getName
    }
    fs.delete(staging, true)
    if (logOn) {
      GeoTableLog.appendEntry(fs, base, op, add = added.sorted.toSeq,
        remove = hitPaths.map(_.getName).sorted)
      fs.delete(new org.apache.hadoop.fs.Path(
        GeoTableLog.inflightDir(base), rwId), false)
      hitPaths.foreach(p => GeoTableLog.retain(fs, base, p))
    }
    // the swap changed the directory's file set under the session's
    // FileStatusCache — invalidate so the next read lists fresh
    spark.catalog.refreshByPath(base)
    matched
  }

  /** Global extent of a geometry column (one action); (0,0,0,0) when
   *  the input has no rows or only null/empty geometries. */
  def extentOf(df: DataFrame, geomCol: String): (Double, Double, Double, Double) = {
    val r = df.select(st_extent_agg(col(geomCol)).as("e"))
      .select(st_xmin(col("e")), st_ymin(col("e")), st_xmax(col("e")), st_ymax(col("e")))
      .collect()(0)
    if (r.isNullAt(0)) (0.0, 0.0, 0.0, 0.0)
    else (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
  }

  /** Read a GeoParquet-convention table (WKB geometry passes through;
   *  presence of `<geom>_bbox` enables data skipping). */
  def readGeoParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Ingest helper: parse a WKT/WKB/GeoJSON source column into the
   *  engine's WKB geometry + bbox convention. */
  def ingest(df: DataFrame, source: Column, format: String, geomCol: String = "geom"): DataFrame = {
    val parsed = format.toLowerCase match {
      case "wkt" => st_geomfromtext(source)
      // note: org.apache.spark.sql.functions also exports st_geomfromwkb
      // (Spark 4.1 native GeometryType plumbing) — ours parses to plain WKB
      case "wkb" => graft.GeoFunctions.st_geomfromwkb(source)
      case "hexwkb" => st_geomfromhexwkb(source)
      case "geojson" => st_geomfromgeojson(source)
      case other => throw new IllegalArgumentException(s"unknown geometry format: $other")
    }
    withBbox(df.withColumn(geomCol, parsed), geomCol)
  }
}
