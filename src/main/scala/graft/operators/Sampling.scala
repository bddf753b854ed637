package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Deterministic corpus sampling/splitting for training-data pipelines.
 * Buckets derive from md5 of the row key — NOT from an engine-native
 * hash or `rand()` — so the assignment is content-stable: re-running on
 * a different engine, partitioning, or day yields the SAME split
 * (the property training pipelines actually need: a document must
 * never migrate between train and eval across reprocessing runs).
 * Everything here is a codegen expression composition; no shuffle.
 */
object Sampling {

  /** Stable bucket in [0, buckets): first 8 md5 hex chars of the key.
   *  Uniform to ~2^-32 over any key distribution. */
  def hashBucket(key: Column, buckets: Int = 100): Column = {
    require(buckets >= 1 && buckets <= (1 << 30), "buckets out of range")
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % buckets
  }

  /** 'val' / 'test' / 'train' tag by hash-percent thresholds (val takes
   *  buckets [0, valPct), test [valPct, valPct+testPct), train the rest). */
  def splitTag(key: Column, valPct: Int = 1, testPct: Int = 1): Column = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 100, "bad split percents")
    val b = hashBucket(key, 100)
    when(b < valPct, "val").when(b < valPct + testPct, "test").otherwise("train")
  }

  /** Deterministic ~pct% sample predicate (content-stable, unlike
   *  `df.sample` whose result depends on partitioning and seed plumbing). */
  def samplePredicate(key: Column, pct: Int): Column = {
    require(pct >= 0 && pct <= 100, "pct out of range")
    hashBucket(key, 100) < pct
  }
}
