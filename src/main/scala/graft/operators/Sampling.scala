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
    // value-identical to
    //   conv(substring(md5(key.cast("string")), 1, 8), 16, 10) % buckets
    // (the engine-replayable contract every oracle replicates) but
    // computed digest-direct — see [[graft.functions.Md5Bucket]]
    org.apache.spark.sql.graft.ColumnShim.column(
      graft.functions.Md5Bucket(
        org.apache.spark.sql.graft.ColumnShim.expr(key.cast("string")), buckets))
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

  /**
   * Deterministic WEIGHTED Bernoulli keep (quality-weighted corpus
   * sampling: keep each row with probability `weightMicro`/1e6, e.g. a
   * quality score) — the per-row uniform is the md5 micro-bucket of
   * the key, so the decision is content-stable and exact-integer
   * (engine-replayable; no float thresholds). Weights clamp to
   * [0, 1e6]: 0 never keeps, 1e6 always keeps. Narrow predicate — a
   * pushed-down filter, no shuffle.
   */
  def weightedPredicate(key: Column, weightMicro: Column): Column =
    hashBucket(key, 1000000) <
      greatest(lit(0L), least(weightMicro.cast("long"), lit(1000000L)))

  /**
   * Weighted corpus mixture (pretraining data mixing): each source
   * contributes `weight` epochs — floor(weight) FULL passes plus a
   * deterministic fractional top-up epoch sampled at the remainder
   * (weight 2.3 = two full copies + a 30% md5-sample), the standard
   * up-/down-sampling recipe for combining corpora of different
   * quality. Rows come back with `source` and `epoch` columns — epoch
   * distinguishes the intentional copies, so a downstream
   * [[Packing.packSequences]] keyed on (source, epoch, key) shuffles
   * them apart.
   *
   * The fractional sample hashes md5("<source>:<key>") — salted per
   * source, so top-ups across sources are decorrelated, and
   * content-stable like every assignment here (re-runs reproduce the
   * exact mixture; weights resolve at 1/10000 granularity). Scale
   * shape: plan-level unions of filtered scans — no shuffle, no
   * driver materialization; a full epoch is a column-append scan and a
   * top-up epoch is a pushed-down filter.
   */
  def mixture(sources: Seq[(String, org.apache.spark.sql.DataFrame, Double)],
      key: String): org.apache.spark.sql.DataFrame = {
    require(sources.nonEmpty, "mixture needs at least one source")
    val parts = sources.flatMap { case (name, df, w) =>
      require(w >= 0, s"negative weight for $name")
      val full = w.toInt
      val fracBp = math.round((w - full) * 10000).toInt // basis points
      val epochs = (0 until full).map { e =>
        df.withColumn("source", lit(name)).withColumn("epoch", lit(e))
      }
      val topUp = if (fracBp <= 0) Nil else Seq(
        df.filter(hashBucket(concat_ws(":", lit(name), col(key).cast("string")),
          10000) < fracBp)
          .withColumn("source", lit(name)).withColumn("epoch", lit(full)))
      epochs ++ topUp
    }
    parts.reduce(_ unionByName _)
  }

  /**
   * Fixed-size deterministic sample per group (balanced eval sets:
   * exactly `n` rows per stratum, not a rate). Rows are ranked inside
   * each group by md5 of the salted key — a content-stable total
   * order, so reruns and engine replays select the SAME rows. One
   * group-keyed window over (group, hash) — at 100 TB pre-aggregate
   * or pre-filter the candidate set first; the window sort is per
   * group and the output is n·groups rows.
   */
  def fixedSizePerGroup(df: org.apache.spark.sql.DataFrame, key: Column,
      group: Column, n: Int): org.apache.spark.sql.DataFrame = {
    require(n >= 1, "n must be positive")
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat_ws(":", group, key.cast("string")))
    val w = Window.partitionBy(group).orderBy(h.asc, key.cast("string").asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /**
   * Topic-balanced subset selection: k-means-cluster the embedding
   * space ([[Similarity.kmeansMicro]] — exact-integer, content-stable
   * seeding), then take exactly `n` rows per cluster by the salted-md5
   * total order of [[fixedSizePerGroup]]. This is the
   * cluster-balancing pass of curation pipelines (over-represented
   * topics down-sample, rare topics keep everything they have) with
   * every stage deterministic and engine-replayable. Returns
   * (id, cluster) for the selected rows.
   */
  def clusterBalanced(df: org.apache.spark.sql.DataFrame, id: Column, vec: Column,
      k: Int = 8, iters: Int = 2, n: Int = 10): org.apache.spark.sql.DataFrame = {
    val assigned = Similarity.kmeansMicro(df, id, vec, k, iters)
    fixedSizePerGroup(assigned, col("id"), col("cluster"), n)
  }

  /**
   * Stratified deterministic sampling: a different sampling rate per
   * stratum (the standard corpus-rebalancing pass — e.g. keep 100% of
   * books, 10% of common-crawl). The predicate hashes
   * md5("<stratum>:<key>"), salting the bucket per stratum so samples
   * across strata are decorrelated, and content-stable like every
   * assignment here. Unknown strata take `defaultPct`. Pure filter
   * expression — no shuffle, pushes down to the scan.
   */
  def stratifiedPredicate(key: Column, stratum: Column,
      rates: Seq[(String, Int)], defaultPct: Int = 100): Column = {
    require(rates.forall { case (_, p) => p >= 0 && p <= 100 }, "pct out of range")
    require(defaultPct >= 0 && defaultPct <= 100, "defaultPct out of range")
    val b = hashBucket(concat_ws(":", stratum, key.cast("string")), 100)
    val pct = rates.foldLeft(lit(defaultPct)) { case (acc, (s, p)) =>
      when(stratum === s, p).otherwise(acc)
    }
    b < pct
  }

  // --- DSIR: Data Selection with Importance Resampling -------------------
  //
  // Xie et al. 2023 ("Data Selection for Language Models via Importance
  // Resampling", NeurIPS): model the target distribution and the raw pool
  // as bags of HASHED word n-grams, score every pool document by the
  // log-likelihood ratio of its features under the two models, and draw
  // the selected subset by Gumbel top-k over those log weights. The whole
  // pass is two corpus scans — fit (one bucket-keyed partial aggregate)
  // and apply (one broadcast join + per-doc aggregate) — with model state
  // bounded by the bucket count, never the corpus.

  /** Hashed feature stream of a document: word unigrams + bigrams (the
   *  DSIR paper's featurization), each md5-bucketed into [0, buckets).
   *  Reuses [[TextOps.wordNgrams]]' whitespace tokenizer so the DuckDB
   *  oracle replays the gram construction with the already-certified
   *  list-comprehension form (q_doc_ngram_lm). */
  private def dsirFeatures(text: Column, buckets: Int): Column = {
    val grams = concat(TextOps.wordNgrams(text, 1), TextOps.wordNgrams(text, 2))
    transform(grams, g => hashBucket(g, buckets))
  }

  /**
   * Fit pass: per-bucket smoothed log-likelihood ratios, in exact
   * 1e-6-nat BIGINTs. For bucket f with target count ct, pool count cr,
   * target/pool feature totals Tt/Tr and Laplace +1 smoothing:
   *
   *   lr_micro(f) = round(1e6 · ln( ((ct+1)/(Tt+B)) / ((cr+1)/(Tr+B)) ))
   *
   * The double expression is composed division-by-division in a fixed
   * order around a SINGLE ln so a SQL oracle sees bit-identical doubles
   * before the 1e-6 rounding (the [[TextOps.ngramLogProb]] discipline).
   * Scale shape: one explode with map-side combine onto at most
   * `buckets` grouped keys, then a 1-row totals broadcast — the ratio
   * table is model-sized (≤ B rows) by construction, the broadcast case.
   *
   * @param isTarget rows where true define the target distribution; all
   *                 other rows are the raw pool.
   * @return (bucket, lr_micro) for every bucket observed in the corpus
   */
  def dsirLogRatios(df: org.apache.spark.sql.DataFrame, text: Column,
      isTarget: Column, buckets: Int = 1024): org.apache.spark.sql.DataFrame = {
    require(buckets >= 2, "buckets must be >= 2")
    import org.apache.spark.sql.functions.{broadcast => bcast}
    val counts = df.select(isTarget.as("__t"),
        explode(dsirFeatures(text, buckets)).as("bucket"))
      .groupBy("bucket")
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("__ct"),
        sum(when(col("__t"), 0L).otherwise(1L)).as("__cr"))
    // grouping-key-free totals: exactly ONE row — the whitelisted
    // broadcast-cross pattern (see ngramLogProb's rationale)
    val totals = counts.agg(sum(col("__ct")).as("__tt"), sum(col("__cr")).as("__tr"))
    val b = lit(buckets.toLong)
    val lr = round(log(
      ((col("__ct") + 1L).cast("double") / (col("__tt") + b)) /
        ((col("__cr") + 1L).cast("double") / (col("__tr") + b))) * 1e6, 0).cast("long")
    counts.crossJoin(bcast(totals)).select(col("bucket"), lr.as("lr_micro"))
  }

  /**
   * Apply pass: per-pool-document importance log-weight
   * logw_micro = Σ_features lr_micro(bucket(feature)) — an exact,
   * aggregation-order-free BIGINT sum of the quantized per-bucket
   * ratios. Only pool rows (!isTarget) are scored; documents whose
   * feature stream is empty keep logw_micro = 0. Scale shape: explode →
   * broadcast join on the model-sized ratio table → per-doc partial
   * aggregate. No corpus shuffle besides the per-doc groupBy.
   *
   * @return (id, n_feat, logw_micro)
   */
  def dsirWeights(df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
      isTarget: Column, buckets: Int = 1024): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast => bcast}
    val ratios = dsirLogRatios(df, text, isTarget, buckets)
    df.filter(!isTarget)
      .select(id.as("id"), explode_outer(dsirFeatures(text, buckets)).as("__b"))
      .join(bcast(ratios), col("__b") === col("bucket"), "left")
      .groupBy("id")
      .agg(count(col("__b")).as("n_feat"),
        coalesce(sum(col("lr_micro")), lit(0L)).as("logw_micro"))
  }

  /**
   * Weighted sampling WITHOUT replacement — the general quality-
   * proportional subset pass ("keep k documents ∝ score"): the
   * Efraimidis-Spirakis scheme in log space, i.e. Gumbel top-k with
   * key_i = ln(w_i) + G_i. The uniform behind G_i is the content-
   * stable md5 micro-bucket of the row key, and both terms quantize
   * to 1e-6 before the exact BIGINT add, so the draw is deterministic
   * and engine-replayable. Rows with non-positive weight never sample
   * (P = 0) and are filtered. Global top-k compiles to
   * TakeOrderedAndProject — no full sort.
   *
   * @param weightMicro weight in 1e-6 units (1e6 = weight 1.0)
   * @return (id, weight_micro, key_micro), the k sampled rows by
   *         (key_micro desc, id asc)
   */
  def weightedSampleK(df: org.apache.spark.sql.DataFrame, id: Column,
      weightMicro: Column, k: Int): org.apache.spark.sql.DataFrame = {
    require(k >= 1, "k must be positive")
    df.filter(weightMicro > 0)
      .select(id.as("id"), weightMicro.cast("long").as("weight_micro"))
      .withColumn("key_micro", sampleKeyMicro(col("id"), col("weight_micro")))
      .orderBy(col("key_micro").desc, col("id").asc)
      .limit(k)
  }

  /**
   * Per-stratum weighted sampling without replacement: exactly
   * min(n, |stratum|) rows per group, inclusion ∝ weight inside each
   * group — the stratified variant of [[weightedSampleK]] (e.g. "keep
   * the best 1M docs per language, quality-proportional"). The Gumbel
   * uniform salts md5("<group>:<key>") so draws across strata are
   * decorrelated, like [[stratifiedPredicate]]. One group-keyed window
   * — the same scale shape (and caveat) as [[fixedSizePerGroup]].
   *
   * @return input group/id/weight plus key_micro and rank (1-based)
   */
  def weightedSamplePerGroup(df: org.apache.spark.sql.DataFrame, id: Column,
      group: Column, weightMicro: Column, n: Int): org.apache.spark.sql.DataFrame = {
    require(n >= 1, "n must be positive")
    import org.apache.spark.sql.expressions.Window
    val salted = concat_ws(":", col("group"), col("id").cast("string"))
    val w = Window.partitionBy(col("group"))
      .orderBy(col("key_micro").desc, col("id").asc)
    df.filter(weightMicro > 0)
      .select(group.as("group"), id.as("id"), weightMicro.cast("long").as("weight_micro"))
      .withColumn("key_micro", sampleKeyMicro(salted, col("weight_micro")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
  }

  /** Micro-quantized standard Gumbel from the content-stable md5
   *  uniform of `key` — the single source of the draw expression (the
   *  engine/oracle bit-exactness contract forbids copies drifting). */
  private[operators] def gumbelMicro(key: Column): Column = {
    val u = (hashBucket(key, 1000000).cast("double") + 0.5) / 1e6
    round(-log(-log(u)) * 1e6, 0).cast("long")
  }

  /** Efraimidis-Spirakis key in exact micro-nats:
   *  round(1e6·ln(w/1e6)) + round(1e6·G(md5-uniform(key))). */
  private def sampleKeyMicro(key: Column, weightMicro: Column): Column =
    round(log(weightMicro.cast("double") / 1e6) * 1e6, 0).cast("long") +
      gumbelMicro(key)

  /**
   * Selection pass: Gumbel top-k resampling over the importance
   * log-weights — the exact scheme that makes "sample k without
   * replacement ∝ w" a single distributed top-k: key_i = ln w_i + G_i
   * with G_i standard Gumbel noise. The uniform behind G_i is the
   * content-stable md5 micro-bucket of the document id ((b+0.5)/1e6 —
   * never exactly 0 or 1), so the draw is engine-replayable like every
   * assignment in this file; the noise is quantized to 1e-6 nats and
   * added to logw_micro in exact BIGINT. The global top-k compiles to
   * TakeOrderedAndProject — no full sort, no driver materialization
   * beyond k rows.
   *
   * @return (id, n_feat, logw_micro, gumbel_micro, key_micro), the k
   *         selected pool documents by (key_micro desc, id asc)
   */
  def dsirSelect(df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
      isTarget: Column, k: Int, buckets: Int = 1024): org.apache.spark.sql.DataFrame = {
    require(k >= 1, "k must be positive")
    val w = dsirWeights(df, id, text, isTarget, buckets)
    w.withColumn("gumbel_micro", gumbelMicro(col("id")))
      .withColumn("key_micro", col("logw_micro") + col("gumbel_micro"))
      .orderBy(col("key_micro").desc, col("id").asc)
      .limit(k)
  }
}
