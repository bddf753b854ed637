package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnShim
import graft.functions.{BloomBitsAgg, BloomHits, WindowHashes}

/**
 * Distributed Bloom-filter membership over character k-gram content —
 * the O(1)-memory alternative to [[Dedup.contamination]]'s broadcast
 * hash-set join for benchmark decontamination (flag training documents
 * whose content overlaps an evaluation corpus).
 *
 * Scale shape: the build side aggregates k-gram window hashes into an
 * mBits-wide bitset via [[graft.functions.BloomBitsAgg]] — map-side OR
 * per task, one mBits/8-byte buffer per partition at the exchange, a
 * single model-sized (≤ 2 MB at the 2^24 default) byte array on the
 * driver (documented collect contract: Bloom state is MODEL-sized, it
 * never grows with the corpus). The probe side is a pure narrow map —
 * one [[graft.functions.WindowHashes]] pass + one
 * [[graft.functions.BloomHits]] membership count per row against the
 * broadcast bitset: no join, no shuffle, no explode of the 100 TB side.
 * False positives are the standard Bloom tradeoff (rate set by
 * mBits/kHashes); false negatives are impossible, which is the safe
 * direction for decontamination (never misses true overlap).
 *
 * Reference frame: duckdb/duckdb_spatial's host engine exposes no Bloom
 * surface; this is pipeline-side functionality (GPT-3-style
 * decontamination, Lee et al. 2022 dedup) built Spark-first.
 */
object Bloom {

  /** Production default: 2^24 bits = 2 MB, k=5 → <0.1% FP at ~1M
   *  distinct inserted grams. */
  val DefaultBits: Int = 1 << 24
  val DefaultHashes: Int = 5
  val DefaultGram: Int = 20

  /** All rolling `gram`-char window hashes of `text` (one pass, no
   *  explode) — the shared content key of build and probe sides. */
  def windowHashes(text: Column, gram: Int = DefaultGram): Column =
    ColumnShim.column(WindowHashes(ColumnShim.expr(text), gram))

  /** Build the Bloom bitset over every `gram`-char window of `text`
   *  across `df`. Returns the mBits/8-byte bitset (model-sized by
   *  construction — safe to hold on the driver and broadcast). */
  def buildBits(df: DataFrame, text: Column, mBits: Int = DefaultBits,
      kHashes: Int = DefaultHashes, gram: Int = DefaultGram): Array[Byte] = {
    val hashes = df.select(explode(windowHashes(text, gram)).as("__h"))
    val agg = ColumnShim.column(
      BloomBitsAgg(ColumnShim.expr(col("__h")), mBits, kHashes).toAggregateExpression())
    hashes.select(agg.as("__bits")).head().getAs[Array[Byte]](0)
  }

  /** Per-row count of DISTINCT `gram`-char windows of `text` whose
   *  kHashes Bloom positions are all set in `bits`. */
  def hitCount(bits: Array[Byte], text: Column,
      kHashes: Int = DefaultHashes, gram: Int = DefaultGram): Column =
    ColumnShim.column(BloomHits(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        bits, org.apache.spark.sql.types.BinaryType),
      ColumnShim.expr(array_distinct(windowHashes(text, gram))), kHashes))

  /**
   * Benchmark decontamination via Bloom membership: builds the bitset
   * from `bench`'s text, probes every `docs` row, and returns one row
   * per document with ≥1 gram: (doc_id, n_grams, n_hits, contaminated)
   * where n_grams counts the document's DISTINCT window hashes, n_hits
   * how many of them the filter claims, and contaminated = n_hits > 0.
   */
  def contamination(docs: DataFrame, docId: Column, docText: Column,
      bench: DataFrame, benchText: Column, mBits: Int = DefaultBits,
      kHashes: Int = DefaultHashes, gram: Int = DefaultGram): DataFrame = {
    val bits = buildBits(bench, benchText, mBits, kHashes, gram)
    docs
      .select(docId.as("doc_id"),
        size(array_distinct(windowHashes(docText, gram))).cast("long").as("n_grams"),
        hitCount(bits, docText, kHashes, gram).cast("long").as("n_hits"))
      .filter(col("n_grams") > 0)
      .withColumn("contaminated", col("n_hits") > 0)
  }
}
