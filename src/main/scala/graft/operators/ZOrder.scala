package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Generic multi-column Z-order clustering — the non-spatial twin of
 * [[graft.sources.GeoTable.writeClustered]]'s Hilbert layout (the
 * reference's R-tree analog covers geometry; a 100 TB training-data
 * table wants the same data-skipping on PLAIN columns: cluster
 * documents by (language, length-bucket) and a language-selective scan
 * reads O(matching files), exactly like Delta/Iceberg OPTIMIZE ZORDER).
 *
 * Spark-first: the z-value is COMPOSED from built-in bit ops
 * (shiftright/&/shiftleft/sum — whole-stage codegen keeps it in the
 * generated loop; no UDF, no custom expression), and the layout is
 * `repartitionByRange` + `sortWithinPartitions` on that key — one
 * range exchange, the same shape the Hilbert writer uses. Parquet then
 * keeps per-row-group and per-file min/max stats on the ORIGINAL
 * columns, and because z-order interleaves bits, every clustered
 * column's per-file range is narrow — the scan-time skipping needs no
 * extra machinery.
 *
 * Contract: inputs are NON-NEGATIVE integral bucket columns, each
 * < 2^bitsPerCol (dictionary-encode / bucketize first — at corpus
 * scale that is one dimension-table broadcast or an arithmetic
 * expression like `length(text) DIV 256`). Out-of-range values fail
 * the write loudly rather than silently aliasing buckets.
 */
object ZOrder {

  /** The z-value: bit j of column i lands at position j*N + i (column
   *  0 owns the least significant bit of each group). Total bits must
   *  fit a signed long. Pure built-in ops — codegen-friendly. */
  def zOrderKey(cols: Seq[Column], bitsPerCol: Int): Column = {
    require(cols.nonEmpty, "zOrderKey: no columns")
    // 62, not 63: inRange's upper bound is `< (1L << bitsPerCol)`, and
    // 1L << 63 overflows to Long.MinValue — a single-column key at 63
    // bits would fail the range guard for EVERY value, valid or not
    require(bitsPerCol >= 1 && cols.size * bitsPerCol <= 62,
      s"zOrderKey: ${cols.size} cols x $bitsPerCol bits exceeds the " +
        "62-bit budget (bit 63 is the sign, and the range guard needs 2^bits to fit)")
    val n = cols.size
    val terms = for {
      (c, i) <- cols.zipWithIndex
      b <- 0 until bitsPerCol
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ + _)
  }

  /** Range guard as a column: true iff every value is in [0, 2^bits). */
  private def inRange(cols: Seq[Column], bitsPerCol: Int): Column =
    cols.map(c => c.cast("long") >= 0L && c.cast("long") < (1L << bitsPerCol))
      .reduce(_ && _)

  /**
   * Write `df` as parquet clustered by the z-order of `cols`
   * (bucketized non-negative ints, see the object doc). One range
   * exchange over the z key, rows sorted within each output file, the
   * key itself dropped — the table reads back as plain parquet with
   * narrow per-file min/max on every clustered column. numFiles <= 0
   * uses the session shuffle partitions.
   */
  def writeZOrdered(df: DataFrame, cols: Seq[Column], path: String,
      bitsPerCol: Int = 16, numFiles: Int = 0): Unit =
    zWrite(df, cols, path, bitsPerCol, numFiles)

  /**
   * Logged delta append to a Z-ordered table — the non-spatial twin of
   * [[graft.sources.GeoTable.appendClustered]], sharing its staged/
   * inflight-marker/commit protocol verbatim (stagedAppend). The batch
   * is z-sorted among itself so new files keep tight per-column
   * min/max stats and skipping degrades only gradually as deltas
   * accumulate; the commit log, change feed, and `geotable` streaming
   * source work identically to the spatial table.
   */
  def appendZOrdered(df: DataFrame, cols: Seq[Column], path: String,
      bitsPerCol: Int = 16, numFiles: Int = 0): Unit =
    graft.sources.GeoTable.stagedAppend(df.sparkSession, path) { staging =>
      zWrite(df, cols, staging, bitsPerCol, numFiles)
    }

  private def zWrite(df: DataFrame, cols: Seq[Column], path: String,
      bitsPerCol: Int, numFiles: Int): Unit = {
    val guarded = df.withColumn("__zok", inRange(cols, bitsPerCol))
      .withColumn("__z",
        when(col("__zok"), zOrderKey(cols, bitsPerCol))
          .otherwise(raise_error(lit(
            s"writeZOrdered: cluster column value out of [0, 2^$bitsPerCol)"))))
      .drop("__zok")
    val parts = if (numFiles > 0) numFiles
      else df.sparkSession.sessionState.conf.numShufflePartitions
    guarded
      .repartitionByRange(parts, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
