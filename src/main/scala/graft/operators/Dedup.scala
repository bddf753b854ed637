package graft.operators

import graft.functions.{Fingerprint, SimHash}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnShim

/**
 * Deduplication operators for large-scale training-data pipelines.
 * All are shuffle-minimal: exact dedup is one hash-groupBy; MinHash
 * LSH is explode→equi-join on (band, band-hash) — the same
 * "blocking equi-join + exact verify" skeleton as [[SpatialJoin]],
 * which is the only join shape that scales on a 1000-executor
 * cluster.
 */
object Dedup {

  /** Stable 128-bit content key (md5 of exact bytes). */
  def contentKey(text: Column): Column = md5(text.cast("binary"))

  /**
   * Exact dedup: keep one row (lowest `id`) per identical `text`.
   * One shuffle on the content hash; the min-id survivor rule makes
   * the result deterministic regardless of partitioning.
   */
  def exact(df: DataFrame, id: Column, text: Column): DataFrame = {
    val w = Window.partitionBy(contentKey(text)).orderBy(id.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Word n-gram shingle hashes (murmur3 over sliding word n-grams,
   *  the standard unit for document near-dup — char n-grams over a
   *  small vocabulary produce spuriously high overlap), distinct.
   *  Set `word = false` for character shingles (short strings/URLs). */
  def shingles(text: Column, n: Int = 3, word: Boolean = true): Column = {
    val t = text.toString
    if (word) {
      val toks = s"split(trim(lower($t)), '\\\\s+')"
      array_distinct(expr(
        s"transform(sequence(1, greatest(size($toks) - ${n - 1}, 1)), " +
        s"i -> hash(concat_ws(' ', slice($toks, i, $n))))"))
    } else {
      array_distinct(expr(
        s"transform(sequence(1, greatest(length($t) - ${n - 1}, 1)), " +
        s"i -> hash(substring($t, i, $n)))"))
    }
  }

  /** MinHash signature: `numHashes` universal-hash minima over the
   *  shingle set. h_j(x) = (a_j*x + b_j) mod p, p = 2^31-1, with
   *  deterministic a/b derived from the index. */
  def minhashSignature(shingleCol: Column, numHashes: Int = 128): Column = {
    val p = 2147483647L
    val rnd = new scala.util.Random(42)
    val as = Array.fill(numHashes)(1 + rnd.nextInt(Int.MaxValue - 1).toLong)
    val bs = Array.fill(numHashes)(rnd.nextInt(Int.MaxValue).toLong)
    val aLit = as.mkString("array(", "L,", "L)")
    val bLit = bs.mkString("array(", "L,", "L)")
    expr(
      s"transform(sequence(0, ${numHashes - 1}), " +
      s"j -> array_min(transform(${shingleCol.toString}, " +
      s"h -> pmod(element_at($aLit, j + 1) * (h & 4294967295L) + element_at($bLit, j + 1), ${p}L))))")
  }

  /**
   * MinHash-LSH candidate pairs: ids of documents whose banded
   * signatures collide in ≥1 band, with the MinHash Jaccard estimate.
   * Standard banding: `bands` bands of `numHashes/bands` rows; a pair
   * is a candidate iff some band matches exactly (equi-join key =
   * (band index, hash of band slice)).
   *
   * Returns (id_a, id_b, est_jaccard) with id_a < id_b, one row per pair.
   */
  def minhashCandidates(
      df: DataFrame, id: Column, text: Column,
      numHashes: Int = 128, bands: Int = 32, shingleSize: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    val sigs = df.select(id.as("__id"), text.as("__text"))
      .withColumn("__sh", shingles(col("__text"), shingleSize))
      .withColumn("__sig", minhashSignature(col("__sh"), numHashes))
      .select(col("__id"), col("__sig"))
    val banded = sigs.select(
      col("__id"), col("__sig"),
      explode(expr(s"transform(sequence(0, ${bands - 1}), b -> named_struct(" +
        s"'band', b, 'bh', hash(slice(__sig, b * $r + 1, $r))))")).as("__band"))
      .select(col("__id"), col("__sig"), col("__band.band"), col("__band.bh"))
    val a = banded.select(col("band"), col("bh"), col("__id").as("id_a"), col("__sig").as("__sig_a"))
    val b = banded.select(col("band"), col("bh"), col("__id").as("id_b"), col("__sig").as("__sig_b"))
    a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))       // pair may collide in many bands
      .agg(first("__sig_a").as("__sig_a"), first("__sig_b").as("__sig_b"))
      .withColumn("est_jaccard",
        expr("size(zip_with(__sig_a, __sig_b, (x, y) -> if(x = y, 1, null))) " +
          "/ cast(size(__sig_a) AS double)"))
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /** Near-dedup via MinHash-LSH: drop every row whose id appears as
   *  the larger member of a candidate pair with est_jaccard ≥
   *  threshold (greedy min-id survivor; one extra left-anti join). */
  def minhashDedup(
      df: DataFrame, id: Column, text: Column, threshold: Double = 0.8,
      numHashes: Int = 128, bands: Int = 32, shingleSize: Int = 3): DataFrame = {
    val dupIds = minhashCandidates(df, id, text, numHashes, bands, shingleSize)
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_b").as("__dup_id")).distinct()
    df.join(dupIds, id === col("__dup_id"), "left_anti")
  }

  /** Exact n-gram Jaccard similarity between two text columns (exact
   *  verify step for MinHash candidates, or small-scale similarity). */
  def jaccard(textA: Column, textB: Column, n: Int = 3): Column = {
    val sa = shingles(textA, n); val sb = shingles(textB, n)
    size(array_intersect(sa, sb)).cast("double") / size(array_union(sa, sb))
  }

  /** 64-bit SimHash fingerprint column (near-dup via hamming distance). */
  def simhash(text: Column, shingleSize: Int = 4): Column =
    ColumnShim.column(SimHash(ColumnShim.expr(text), shingleSize))

  /** Hamming distance between two simhash columns. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidate pairs: block on the 4 16-bit quarters
   *  of the simhash (any pair within hamming distance 3 shares at
   *  least one exact quarter — pigeonhole), verify hamming ≤ maxDist. */
  def simhashCandidates(df: DataFrame, id: Column, text: Column, maxDist: Int = 3): DataFrame = {
    val withSig = df.select(id.as("__id"), simhash(text).as("__sig"))
    val blocked = withSig.select(col("__id"), col("__sig"),
      explode(expr("transform(sequence(0, 3), q -> named_struct(" +
        "'q', q, 'qh', shiftright(__sig, q * 16) & 65535))")).as("__b"))
      .select(col("__id"), col("__sig"), col("__b.q"), col("__b.qh"))
    val a = blocked.select(col("q"), col("qh"), col("__id").as("id_a"), col("__sig").as("__sig_a"))
    val b = blocked.select(col("q"), col("qh"), col("__id").as("id_b"), col("__sig").as("__sig_b"))
    a.join(b, Seq("q", "qh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(first("__sig_a").as("sa"), first("__sig_b").as("sb"))
      .withColumn("hamming", hammingDistance(col("sa"), col("sb")))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }

  /** Rolling-hash document fingerprint column. */
  def fingerprint(text: Column, k: Int = 8): Column =
    ColumnShim.column(Fingerprint(ColumnShim.expr(text), k))
}
