package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Change-data feed over a GeoTable commit log: row-level changes
 * between two committed versions, reconstructed from the log's
 * immutable per-version add/remove file sets — no change files are
 * ever written, and only the files a commit actually touched are read
 * (an append's delta files; a rewrite's before/after pair), so the
 * cost of a change batch is proportional to the commit, not the table.
 *
 * The reference's nearest analog is the R-tree's WAL replay
 * (duckdb_spatial rtree_index.cpp insert/delete records,
 * test/sql/index/rtree_persistence_wal.test): its WAL carries
 * row-level index deltas for crash recovery, but is not user-readable.
 * This feed exposes the same information as a queryable DataFrame —
 * the Delta-CDF-style shape a 100 TB training-data pipeline needs to
 * consume a table incrementally (downstream dedup gates, index
 * refresh, feature backfill) instead of re-scanning it per run.
 *
 * Change rows carry the table columns plus:
 *   - `_change_type`: insert | delete | update_preimage |
 *     update_postimage (Delta CDF vocabulary)
 *   - `_commit_version`: the log version that produced the change
 *
 * Per-op reconstruction (ops as GeoTable writes them):
 *   - `init` (always version 0 — enable() and vacuum's rebase both
 *     start a fresh log): every row of its file set is an insert —
 *     the feed's view of "the table appeared".
 *   - `append`: the staged delta files are exactly the commit's new
 *     rows — inserts, read directly, no diff needed.
 *   - `compact`: rewrites files but preserves the row multiset exactly
 *     (compactDeltas' contract, fuzz-asserted) — no change rows.
 *   - `delete`: removed-files ∖ added-files (multiset difference over
 *     full rows) are the deleted rows; the rewrite keeps survivors.
 *   - `update`: removed ∖ added are pre-images, added ∖ removed are
 *     post-images. Both diffs touch only the rewritten files.
 *
 * Version numbers are stable until a vacuum rebase or recluster
 * checkpoint renumbers history; a feed consumer that crosses one must
 * re-sync from a snapshot (same contract as Delta's CDF after VACUUM).
 */
object GeoTableChanges {

  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"

  /**
   * Changes committed in versions [startVersion, endVersion], both
   * inclusive; endVersion -1 (default) means the latest version.
   * Returns table columns + `_change_type` + `_commit_version`.
   */
  def readChanges(spark: SparkSession, path: String,
      startVersion: Int, endVersion: Int = -1): DataFrame = {
    val base = path.stripSuffix("/")
    val fs = GeoTableLog.fsOf(spark, base)
    val es = GeoTableLog.entries(fs, base)
    require(es.nonEmpty, s"no commit log at $base (GeoTableLog.enable first)")
    val last = es.last._1
    val endV = if (endVersion < 0) last else endVersion
    require(startVersion >= 0 && startVersion <= endV,
      s"bad change range [$startVersion, $endV] (log has ${es.head._1}..$last)")
    require(endV <= last,
      s"version $endV not committed yet at $base (latest is $last)")
    val inRange = es.filter { case (v, _, _, _) => v >= startVersion && v <= endV }
    // the range must be contiguous in the live log: a missing version
    // means a vacuum rebase renumbered history under the caller
    require(inRange.map(_._1) == (math.max(startVersion, es.head._1) to endV),
      s"versions [$startVersion, $endV] are not contiguous in the log at $base " +
        "(history was rebased by vacuum/recluster — re-sync from a snapshot)")
    val parts = changeFrames(spark, fs, base, inRange)
    if (parts.isEmpty) {
      // shape-stable empty result: live table schema + the CDC columns
      spark.read.parquet(base).limit(0)
        .withColumn(ChangeTypeCol, lit(null).cast("string"))
        .withColumn(CommitVersionCol, lit(null).cast("int"))
    } else parts.reduce(_ unionByName _)
  }

  /** Change frames for a contiguous entry range — shared by the batch
   *  feed and the streaming source's change-feed mode. Plan-size
   *  discipline: a range can span 10^4+ commits and the dominant op is
   *  append, so ALL insert commits (init/append) ride ONE parquet scan
   *  plus a broadcast (file basename -> version) map (part-file
   *  basenames carry a UUID, unique across the table's life) instead
   *  of a union branch per commit; only delete/update rewrites need
   *  their per-commit before/after diff. */
  private[graft] def changeFrames(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, base: String,
      inRange: Seq[(Int, String, Seq[String], Seq[String])]): Seq[DataFrame] = {
    val (inserts, rewrites) = inRange.partition(e => e._2 == "init" || e._2 == "append")
    val insertFrames: Seq[DataFrame] = {
      val fileVers = inserts.flatMap { case (v, _, add, _) => add.map(_ -> v) }
      if (fileVers.isEmpty) Nil
      else {
        val paths = GeoTableLog.resolveFiles(
          fs, base, fileVers.map(_._1), "change feed inserts")
        val sq = spark; import sq.implicits._
        val nameToV = fileVers.toDF("__base", CommitVersionCol)
        Seq(spark.read.parquet(paths: _*)
          .withColumn("__base", element_at(split(input_file_name(), "/"), -1))
          .join(broadcast(nameToV), "__base").drop("__base")
          .withColumn(ChangeTypeCol, lit("insert")))
      }
    }
    insertFrames ++ rewrites.flatMap { case (v, op, add, remove) =>
      changesOf(spark, fs, base, v, op, add, remove)
    }
  }

  /** The change rows of one commit; empty for no-op commits. */
  private def changesOf(spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
      base: String, v: Int, op: String,
      add: Seq[String], remove: Seq[String]): Seq[DataFrame] = {
    def read(names: Seq[String]): Option[DataFrame] =
      if (names.isEmpty) None
      else Some(spark.read.parquet(
        GeoTableLog.resolveFiles(fs, base, names, s"change feed version $v"): _*))
    def tag(df: DataFrame, kind: String): DataFrame =
      df.withColumn(ChangeTypeCol, lit(kind)).withColumn(CommitVersionCol, lit(v))
    op match {
      case "init" | "append" =>
        read(add).map(tag(_, "insert")).toSeq
      case "compact" =>
        Nil // row multiset preserved by contract
      case "delete" =>
        (read(remove), read(add)) match {
          case (Some(before), Some(after)) => Seq(tag(before.exceptAll(after), "delete"))
          case (Some(before), None) => Seq(tag(before, "delete")) // whole files deleted
          case _ => Nil
        }
      case "update" =>
        (read(remove), read(add)) match {
          case (Some(before), Some(after)) => Seq(
            tag(before.exceptAll(after), "update_preimage"),
            tag(after.exceptAll(before), "update_postimage"))
          case _ => throw new IllegalStateException(
            s"update commit $v at $base lacks a before/after file pair")
        }
      case other => throw new IllegalStateException(
        s"unknown commit op '$other' at version $v of $base")
    }
  }
}
