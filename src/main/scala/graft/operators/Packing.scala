package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for LLM pretraining batches: concatenate the corpus
 * in a deterministic seeded shuffle order and cut it into fixed
 * token-budget sequences — each document is assigned the sequence
 * where it STARTS (`seq_id`) and its offset inside it (`seq_offset`),
 * the standard GPT-style pack-and-cut (documents may straddle a cut;
 * the trainer masks across the boundary).
 *
 * Scale shape: the naive formulation is a cumulative sum over ONE
 * global ordering — a single-partition window, the classic driver-
 * funnel mistake at 100 TB. This implementation is the distributed
 * two-pass prefix scan instead: range-partition by the shuffle key
 * (Spark's sort machinery, n-way parallel), per-partition token sums
 * (numPartitions rows to the driver — scalar stats, not data), prefix
 * offsets broadcast back, then a PER-PARTITION window adds the local
 * running sum. Every stage is n-way parallel; the only global object
 * is one long per partition.
 *
 * The assignment is CONTENT-STABLE: `seq_id`/`seq_offset` derive from
 * the md5 shuffle order and token counts alone — not from partition
 * boundaries — so re-running on different cluster sizes, partition
 * counts, or engines reproduces byte-identical packing (the same
 * property [[Sampling]] guarantees for splits, and why the shuffle
 * key is md5 of seed:key, not `rand()`).
 */
object Packing {

  /** Deterministic seeded shuffle-order key: md5("<seed>:<key>").
   *  Content-stable analog of "globally shuffle the corpus". */
  def shuffleKey(key: Column, seed: Long): Column =
    md5(concat_ws(":", lit(seed.toString), key.cast("string")))

  /** Global deterministic shuffle: total order by the seeded key
   *  (range-partitioned sort — no single-partition funnel). */
  def shuffled(df: DataFrame, key: Column, seed: Long = 0L): DataFrame =
    df.orderBy(shuffleKey(key, seed), key)

  /**
   * Assign `seq_id` / `seq_offset` for pack-and-cut at `budget` tokens
   * per sequence. `tokens` is the per-document token count (e.g.
   * [[TextOps.subwordCount]]); ties in the md5 order break by `key`.
   */
  def packSequences(df: DataFrame, key: Column, tokens: Column, budget: Long,
      seed: Long = 0L): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    val base = df
      .withColumn("__ord", shuffleKey(key, seed))
      .withColumn("__key", key.cast("string"))
      .withColumn("__tok", tokens.cast("long"))
    // range partition on the FULL sort key so order ties cannot span a
    // partition boundary, then sort within — Spark's parallel sort
    val sorted = base
      .repartitionByRange(col("__ord"), col("__key"))
      .sortWithinPartitions("__ord", "__key")
      .withColumn("__pid", spark_partition_id())
    sorted.persist()
    try {
      // pass 1: per-partition token totals (numPartitions rows — the
      // declared driver-scalar class, like SpatialJoin's cell stats)
      val partSums = sorted.groupBy("__pid").agg(sum("__tok").as("__psum"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      var acc = 0L
      val offsets = partSums.map { case (pid, s) => val o = acc; acc += s; (pid, o) }
      // explicit Row + schema (not tuple reflection): encoder-free, so
      // the operator also works under REPL/driver classloaders where
      // ScalaReflection cannot resolve product types
      val offSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__pid",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("__poff",
          org.apache.spark.sql.types.LongType)))
      val offDf = broadcast(spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          java.util.Arrays.asList(offsets.map(o =>
            org.apache.spark.sql.Row(o._1, o._2)): _*)),
        offSchema))
      // pass 2: per-partition running sum (parallel window — partitioned
      // by __pid, never a global single-partition frame)
      val w = Window.partitionBy("__pid").orderBy("__ord", "__key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val packed = sorted.join(offDf, "__pid")
        .withColumn("__gs", col("__poff") + sum("__tok").over(w) - col("__tok"))
        .withColumn("seq_id", expr(s"__gs DIV ${budget}L"))
        .withColumn("seq_offset", col("__gs") % budget)
        .drop("__ord", "__key", "__tok", "__pid", "__poff", "__gs")
      // materialize before releasing the sorted input (same
      // persist-discipline as Dedup.materializeThenFree): the result
      // must not silently recompute the two-pass scan after unpersist
      val out = packed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count()
      out
    } finally sorted.unpersist(blocking = false)
  }

  /**
   * Token-budget corpus subset: the documents that START within the
   * first `budget` tokens of the deterministic shuffled stream — "give
   * me a fair ~N-token slice of the corpus", the standard way to carve
   * a fixed training budget out of a larger pool. Pure composition
   * over [[packSequences]]: a document starts inside the budget iff
   * its global start offset < budget iff its `seq_id` is 0 at this
   * budget — so the subset inherits the distributed two-pass prefix
   * scan and the content-stable (cluster-size-independent) assignment.
   */
  def tokenBudgetSample(df: DataFrame, key: Column, tokens: Column,
      budget: Long, seed: Long = 0L): DataFrame =
    packSequences(df, key, tokens, budget, seed)
      .where(col("seq_id") === 0L)
      .drop("seq_id", "seq_offset")
}
