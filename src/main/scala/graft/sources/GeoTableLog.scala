package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * Commit log + snapshot reads for clustered tables — the analog of the
 * reference R-tree's WAL/MVCC row CRUD (`rtree_index.cpp`,
 * `test/sql/index/rtree_crud.test`: transactional INSERT/UPDATE/DELETE
 * with readers seeing consistent snapshots). A lakehouse table format
 * is the Spark-idiomatic answer, so this is a miniature one:
 *
 *   - `<table>/_graft_log/NNNNNNNNNN.json` — one entry per committed
 *     maintenance op: `{"version":N,"op":"...","add":[...],"remove":[...]}`
 *     over part-file BASENAMES. Underscore-prefixed, so ordinary
 *     `spark.read.parquet(table)` never sees it.
 *   - With the log enabled, [[GeoTable.deleteWhere]]/[[GeoTable.updateWhere]]
 *     RETAIN the files they would have deleted (moved to
 *     `_graft_log/retained/`) and append a commit; [[GeoTable.appendClustered]]
 *     commits its added files.
 *   - [[readVersion]] replays the log prefix and reads exactly that
 *     version's file set — time travel to any committed state.
 *   - [[GeoTable.recluster]] is the checkpoint/VACUUM analog: it
 *     compacts history away and re-initializes the log at the new
 *     layout (documented, like the reference's index rebuild).
 *
 * Scale shape: the log is file-count-sized JSON (driver metadata, the
 * same order as parquet footers); retained files cost storage, never
 * read time — current-version reads list only the table root. Single
 * writer, like every maintenance op here; snapshot reads are safe
 * against concurrent maintenance because committed versions only ever
 * reference immutable files (a new commit never mutates old parts —
 * they are moved, not rewritten, and [[readVersion]] resolves either
 * location).
 */
object GeoTableLog {

  private def logDir(base: String) = new Path(base.stripSuffix("/"), "_graft_log")
  private def retainedDir(base: String) = new Path(logDir(base), "retained")

  private[sources] def fsOf(spark: SparkSession, base: String): FileSystem =
    new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Is the commit log enabled for this table? */
  def isEnabled(fs: FileSystem, base: String): Boolean =
    fs.exists(logDir(base.stripSuffix("/")))

  /** Data-file basenames currently in the table root. */
  private def dataFiles(fs: FileSystem, base: String): Seq[String] =
    fs.listStatus(new Path(base.stripSuffix("/")))
      .map(_.getPath.getName)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .sorted.toSeq

  /**
   * Enable the commit log on an existing clustered table: version 0 =
   * the current file set. Idempotent-hostile on purpose — enabling
   * twice is a caller bug (it would fork history), so it fails loudly.
   */
  def enable(spark: SparkSession, path: String): Unit = {
    val base = path.stripSuffix("/")
    val fs = fsOf(spark, base)
    require(!isEnabled(fs, base), s"commit log already enabled at $base")
    fs.mkdirs(retainedDir(base))
    appendEntry(fs, base, "init", add = dataFiles(fs, base), remove = Nil)
  }

  /** Append one commit entry; returns the new version number. */
  private[sources] def appendEntry(fs: FileSystem, base: String, op: String,
      add: Seq[String], remove: Seq[String]): Int = {
    val v = entries(fs, base).lastOption.map(_._1 + 1).getOrElse(0)
    def arr(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json = s"""{"version":$v,"op":"$op","add":${arr(add)},"remove":${arr(remove)}}"""
    val p = new Path(logDir(base), f"$v%010d.json")
    val out = fs.create(p, false)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    v
  }

  /** Move a data file aside instead of deleting it (commit-log mode).
   *  Part names carry write UUIDs, so collisions mean a caller bug. */
  private[sources] def retain(fs: FileSystem, base: String, file: Path): Unit = {
    val dst = new Path(retainedDir(base), file.getName)
    require(!fs.exists(dst), s"retained name collision: ${file.getName}")
    if (!fs.rename(file, dst))
      throw new java.io.IOException(s"cannot retain $file")
    val crc = new Path(file.getParent, "." + file.getName + ".crc")
    if (fs.exists(crc)) fs.delete(crc, false)
  }

  /** All committed (version, op, add, remove) entries in order. */
  def entries(spark: SparkSession, path: String):
      Seq[(Int, String, Seq[String], Seq[String])] = {
    val base = path.stripSuffix("/")
    entries(fsOf(spark, base), base)
  }

  /** All committed (version, op, add, remove) entries in order. */
  def entries(fs: FileSystem, base: String):
      Seq[(Int, String, Seq[String], Seq[String])] = {
    val dir = logDir(base.stripSuffix("/"))
    if (!fs.exists(dir)) return Nil
    // crash recovery: a vacuum that died after dropping the old
    // entries left its complete rebased set staged — finish the swap
    val staged = new Path(dir, "rebase.tmp")
    if (fs.exists(staged) &&
        !fs.listStatus(dir).exists(s => s.getPath.getName.endsWith(".json")))
      promoteStagedRebase(fs, base.stripSuffix("/"))
    else if (fs.exists(staged))
      fs.delete(staged, true) // vacuum died BEFORE the drop: old log is intact
    fs.listStatus(dir).map(_.getPath).filter(_.getName.endsWith(".json"))
      .sortBy(_.getName).toSeq.map { p =>
        val in = fs.open(p)
        val text = try {
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
          bos.toString("UTF-8")
        } finally in.close()
        parseEntry(text)
      }
  }

  /** Minimal parser for the entry shape this object writes (basenames
   *  never contain quotes or backslashes). */
  private def parseEntry(json: String): (Int, String, Seq[String], Seq[String]) = {
    def field(name: String): String = {
      val i = json.indexOf("\"" + name + "\":")
      require(i >= 0, s"commit entry missing $name: $json")
      json.substring(i + name.length + 3)
    }
    val v = field("version").takeWhile(_.isDigit).toInt
    val op = field("op").drop(1).takeWhile(_ != '"')
    def list(name: String): Seq[String] = {
      val body = field(name).drop(1).takeWhile(_ != ']')
      if (body.isEmpty) Nil
      else body.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
    }
    (v, op, list("add"), list("remove"))
  }

  /** The file-basename set of a committed version. */
  def fileSetAt(fs: FileSystem, base: String, version: Int): Seq[String] = {
    val es = entries(fs, base)
    require(es.nonEmpty, s"no commit log at $base")
    require(es.exists(_._1 == version),
      s"version $version not in log (have ${es.head._1}..${es.last._1})")
    val live = scala.collection.mutable.LinkedHashSet[String]()
    es.takeWhile(_._1 <= version).foreach { case (_, _, add, remove) =>
      remove.foreach(live -= _)
      add.foreach(live += _)
    }
    live.toSeq
  }

  /** Latest committed version number. */
  def latestVersion(spark: SparkSession, path: String): Int = {
    val base = path.stripSuffix("/")
    val es = entries(fsOf(spark, base), base)
    require(es.nonEmpty, s"no commit log at $base")
    es.last._1
  }

  /**
   * Snapshot read of a committed version: resolves each basename to
   * the table root (still live) or `_graft_log/retained/` (superseded)
   * and reads exactly those immutable files. The version's rows are
   * byte-stable across later maintenance until a recluster checkpoint
   * compacts history.
   */
  def readVersion(spark: SparkSession, path: String, version: Int): DataFrame = {
    val base = path.stripSuffix("/")
    val fs = fsOf(spark, base)
    val names = fileSetAt(fs, base, version)
    // a schema-less empty frame would fail downstream column refs with
    // a baffling UNRESOLVED_COLUMN — fail here with the actual cause
    if (names.isEmpty) throw new IllegalStateException(
      s"version $version of $base has no data files (read the live table " +
        "with spark.read.parquet for its schema)")
    val paths = names.map { n =>
      val live = new Path(base, n)
      val kept = new Path(retainedDir(base), n)
      if (fs.exists(live)) live.toString
      else if (fs.exists(kept)) kept.toString
      else throw new java.io.IOException(
        s"version $version references vacuumed file $n (recluster checkpointed history)")
    }
    spark.read.parquet(paths: _*)
  }

  /** Checkpoint: drop all history, re-init at the current file set
   *  (called by recluster — the VACUUM/index-rebuild analog). */
  private[sources] def checkpoint(fs: FileSystem, base: String): Unit = {
    fs.delete(logDir(base), true)
    fs.mkdirs(retainedDir(base))
    appendEntry(fs, base, "init", add = dataFiles(fs, base), remove = Nil)
  }

  /**
   * Drop history before `keepFrom`: retained files referenced ONLY by
   * versions < keepFrom are physically deleted and the log is rebased
   * so keepFrom becomes a fresh version-0 init of its file set (later
   * commits are renumbered onto it unchanged). The storage-retention
   * knob of the WAL analog — bounded history without giving up recent
   * snapshots (recluster's checkpoint drops everything instead).
   * Returns the number of retained files deleted. Single-writer, like
   * every maintenance op.
   */
  def vacuum(spark: SparkSession, path: String, keepFrom: Int): Long = {
    val base = path.stripSuffix("/")
    val fs = fsOf(spark, base)
    val es = entries(fs, base)
    require(es.nonEmpty, s"no commit log at $base")
    require(es.exists(_._1 == keepFrom), s"version $keepFrom not in log")
    if (keepFrom == es.head._1) return 0L
    // files needed by any surviving version = union of file sets at
    // keepFrom.. latest; every other retained file goes
    val needed = es.map(_._1).filter(_ >= keepFrom)
      .flatMap(v => fileSetAt(fs, base, v)).toSet
    var dropped = 0L
    val retained = retainedDir(base)
    if (fs.exists(retained)) fs.listStatus(retained).foreach { st =>
      if (!needed.contains(st.getPath.getName)) {
        fs.delete(st.getPath, false); dropped += 1
      }
    }
    // rebase: version 0 = init(fileSetAt(keepFrom)), then the later
    // entries verbatim with shifted numbers. Only the entry JSONs are
    // replaced — retained/ lives inside the log dir and must survive
    // (the surviving snapshots still resolve files there). Crash
    // safety: the rebased entries are STAGED under rebase.tmp first,
    // then the old entries drop and the staged set moves in — a crash
    // between those steps leaves a complete staged log that
    // [[entries]] self-heals from (the recluster "never zero copies"
    // bar applied to the log itself).
    val baseSet = fileSetAt(fs, base, keepFrom)
    val tail = es.filter(_._1 > keepFrom)
    val tmp = new Path(logDir(base), "rebase.tmp")
    fs.delete(tmp, true); fs.mkdirs(tmp)
    def stage(v: Int, op: String, add: Seq[String], remove: Seq[String]): Unit = {
      def arr(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
      val out = fs.create(new Path(tmp, f"$v%010d.json"), false)
      try out.write(
        s"""{"version":$v,"op":"$op","add":${arr(add)},"remove":${arr(remove)}}"""
          .getBytes("UTF-8"))
      finally out.close()
    }
    stage(0, "init", baseSet, Nil)
    tail.zipWithIndex.foreach { case ((_, op, add, remove), i) =>
      stage(i + 1, op, add, remove)
    }
    fs.listStatus(logDir(base)).map(_.getPath)
      .filter(_.getName.endsWith(".json")).foreach(fs.delete(_, false))
    promoteStagedRebase(fs, base)
    dropped
  }

  /** Move a complete staged rebase (the .json entries under
   *  rebase.tmp) into the log dir. Shared by [[vacuum]] and the
   *  [[entries]] crash recovery. */
  private def promoteStagedRebase(fs: FileSystem, base: String): Unit = {
    val tmp = new Path(logDir(base), "rebase.tmp")
    fs.listStatus(tmp).map(_.getPath).filter(_.getName.endsWith(".json"))
      .foreach { p =>
        val dst = new Path(logDir(base), p.getName)
        if (fs.exists(dst)) fs.delete(dst, false)
        if (!fs.rename(p, dst))
          throw new java.io.IOException(s"vacuum: cannot promote $p")
      }
    fs.delete(tmp, true)
  }
}
