package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding tokenizer: distributed corpus statistics, driver-side
 * merge training over the bounded word-frequency model, distributed encode.
 *
 * The reference engine's host ships no tokenizer — this is part of the
 * beyond-reference LLM-data-pipeline surface (a training corpus needs real
 * subword token counts, not the `subwordCount` regex estimate in
 * [[TextOps]]).
 *
 * Scale shape (the part that must survive 100 TB):
 *  - [[wordFreq]] is ONE map-side-combined aggregation over the corpus
 *    collapsing to a top-`maxWords` model — the only data-sized pass.
 *  - [[train]] runs on that model ONLY: cost is corpus-size independent
 *    (the standard approach — published BPE implementations train on a
 *    word-frequency table, not raw text). The collected model is
 *    explicitly bounded by `maxWords` (same model-sized-collect contract
 *    as Similarity's codebooks).
 *  - [[encode]] is a narrow map with broadcast merge ranks and a
 *    per-partition word cache (real corpora repeat words heavily).
 *
 * Merge-application semantics — deliberately oracle-replicable: merges
 * apply IN RANK ORDER, each merging all left-to-right non-overlapping
 * occurrences in TOKEN space (standard BPE — adjacent repeats both
 * merge: 'raining' + (i,n) → [r,a,in,in,g]). The SQL oracle replays
 * this as `replace()` on a space-joined token string iterated to
 * FIXPOINT per merge — a single replace() pass is NOT equivalent (it
 * consumes the shared delimiter space between adjacent occurrences and
 * skips the second), which is why the gate oracle nests 12 passes.
 * The fixpoint formulation is itself exact only for merges with
 * a != b: an identical-symbol (x,x) pattern self-overlaps, and the
 * char-level scan picks a different non-overlapping set than the
 * token-level greedy scan — the oracle builders refuse such merge
 * lists rather than certify unsoundly (the ENGINE handles (x,x)
 * correctly; only the SQL replication cannot).
 */
object Bpe {

  /** Pre-tokenizer: lowercased letter runs. Chosen deliberately
   *  SQL-replicable (`regexp_extract_all(lower(text), '[a-z]+')`) so the
   *  driver oracle can certify every downstream stage. */
  def preTokens(text: Column): Column =
    regexp_extract_all(lower(coalesce(text, lit(""))), lit("[a-z]+"), lit(0))

  /**
   * Distributed word-frequency model: top `maxWords` words by
   * (count desc, word asc — the tie-break makes the model, and
   * therefore training, deterministic). TakeOrdered under the hood:
   * one shuffle to `word`, then a bounded top-k — no full sort.
   */
  def wordFreq(df: DataFrame, text: Column, maxWords: Int = 50000): DataFrame =
    df.select(explode(preTokens(text)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(maxWords)

  /**
   * Adjacent character-pair counts over the word-frequency model,
   * weighted by word count — the exact statistic the first training
   * iteration maximizes, exposed as a DataFrame so the driver gate can
   * certify the training INPUT hash-exact (the merge loop itself is
   * driver-side; see [[train]]).
   */
  def pairCounts(wf: DataFrame): DataFrame =
    wf.where(length(col("word")) >= 2)
      .select(col("word"), col("n"),
        explode(sequence(lit(1), length(col("word")) - 1)).as("i"))
      .select(concat(expr("substring(word, i, 1)"), lit(" "),
        expr("substring(word, i + 1, 1)")).as("pair"), col("n"))
      .groupBy("pair").agg(sum("n").as("cnt"))

  /**
   * Train `nMerges` merges on the driver over the collected
   * word-frequency model (Sennrich's algorithm: repeatedly merge the
   * most frequent adjacent symbol pair, count weighted by word
   * frequency; ties break lexicographically for determinism). Cost is
   * O(nMerges × model chars) worst case with the occurrence index —
   * corpus-size independent.
   */
  def train(wf: DataFrame, nMerges: Int): Seq[(String, String)] = {
    val rows = wf.collect()
    val words: Array[Array[String]] =
      rows.map(r => r.getString(0).map(_.toString).toArray)
    val freqs: Array[Long] = rows.map(_.getLong(1))
    trainLocal(words, freqs, nMerges)
  }

  /** The merge loop itself, on an in-memory (tokenized word, freq)
   *  model — exposed for specs (the published worked examples are
   *  hand-sized). */
  private[graft] def trainLocal(
      words: Array[Array[String]], freqs: Array[Long], nMerges: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    val toks: Array[mutable.ArrayBuffer[String]] =
      words.map(w => mutable.ArrayBuffer.from(w))
    // pair -> total weighted count, and pair -> words containing it
    val counts = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def add(p: (String, String), wi: Int, d: Long): Unit = {
      val c = counts.getOrElse(p, 0L) + d
      if (c <= 0L) { counts.remove(p); where.get(p).foreach(_.remove(wi)) }
      else {
        counts(p) = c
        if (d > 0) where.getOrElseUpdate(p, mutable.Set.empty) += wi
      }
    }
    toks.indices.foreach { wi =>
      val t = toks(wi)
      var i = 0
      while (i < t.length - 1) { add((t(i), t(i + 1)), wi, freqs(wi)); i += 1 }
    }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var k = 0
    while (k < nMerges && counts.nonEmpty) {
      // max by (count desc, pair asc) — deterministic across runs
      val best = counts.keysIterator.reduce { (a, b) =>
        val ca = counts(a); val cb = counts(b)
        if (ca > cb) a
        else if (cb > ca) b
        else {
          val byPair = Ordering.Tuple2[String, String].compare(a, b)
          if (byPair <= 0) a else b
        }
      }
      merges += best
      val merged = best._1 + best._2
      // apply in every word containing the pair; update neighbor counts
      val hits = where.getOrElse(best, mutable.Set.empty).toArray.sorted
      hits.foreach { wi =>
        val t = toks(wi); val f = freqs(wi)
        val out = mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < t.length) {
          if (i < t.length - 1 && t(i) == best._1 && t(i + 1) == best._2) {
            // non-overlapping left-to-right, matching encode/replace()
            if (out.nonEmpty) { add((out.last, t(i)), wi, -f); add((out.last, merged), wi, f) }
            add((t(i), t(i + 1)), wi, -f)
            if (i + 2 < t.length) { add((t(i + 1), t(i + 2)), wi, -f); add((merged, t(i + 2)), wi, f) }
            out += merged
            i += 2
          } else { out += t(i); i += 1 }
        }
        toks(wi) = out
      }
      // the merged-away pair must be gone even if bookkeeping left residue
      counts.remove(best); where.remove(best)
      k += 1
    }
    merges.toSeq
  }

  /**
   * Distributed encode: per document, pre-tokenize then apply `merges`
   * in rank order to each word (all occurrences, left-to-right
   * non-overlapping — see the object doc for why this exact semantics).
   * Output: (id, tokens array<string>). Broadcast-size contract: the
   * merge list is model-sized (≤ vocab). A per-partition word cache
   * makes the loop O(unique words), not O(words).
   */
  def encode(df: DataFrame, id: Column, text: Column,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // a non-integral id would cast to null and kill the task with an
    // opaque encoder error — refuse clearly at plan time (null ids in
    // an integral column still error at runtime: ids are structural)
    val idType = df.select(id).schema.head.dataType
    require(Seq("ByteType", "ShortType", "IntegerType", "LongType")
      .contains(idType.toString),
      s"Bpe.encode: id must be an integral type, got $idType")
    val bc = spark.sparkContext.broadcast(merges.toArray)
    val in = df.select(id.cast("long").as("id"), preTokens(text).as("words"))
      .as[(Long, Seq[String])]
    in.mapPartitions { it =>
      val ms = bc.value
      val cache = new java.util.HashMap[String, Array[String]]()
      it.map { case (docId, ws) =>
        val toks = ws.iterator.flatMap { w =>
          var enc = cache.get(w)
          if (enc == null) {
            enc = encodeWord(w, ms)
            if (cache.size < 100000) cache.put(w, enc) // bounded per-partition memo
          }
          enc
        }.toArray
        (docId, toks)
      }
    }.toDF("id", "tokens")
  }

  /** Apply the merge list in rank order to one word. */
  private[graft] def encodeWord(w: String, merges: Array[(String, String)]): Array[String] = {
    var t: Array[String] = w.map(_.toString).toArray
    var m = 0
    while (m < merges.length && t.length > 1) {
      val (a, b) = merges(m)
      // fast reject: does the pair occur at all?
      var has = false
      var i = 0
      while (!has && i < t.length - 1) { has = t(i) == a && t(i + 1) == b; i += 1 }
      if (has) {
        val out = new scala.collection.mutable.ArrayBuffer[String](t.length)
        var j = 0
        while (j < t.length) {
          if (j < t.length - 1 && t(j) == a && t(j + 1) == b) { out += (a + b); j += 2 }
          else { out += t(j); j += 1 }
        }
        t = out.toArray
      }
      m += 1
    }
    t
  }

  /** Vocabulary of a merge list: the single characters appearing in
   *  merges plus one token per DISTINCT merged string, ranked (chars
   *  first by codepoint, then merge products by first rank — two
   *  merges producing the same string, e.g. (a,bc) and (ab,c), share
   *  one id rather than silently shifting every later id). Characters
   *  never involved in any merge are not in the vocab; callers treat
   *  any length-1 token as its codepoint (the BpeSpec contract). */
  def vocab(merges: Seq[(String, String)]): Map[String, Int] = {
    val chars = merges.flatMap { case (a, b) => (a + b).map(_.toString) }.distinct.sorted
    val toks = (chars ++ merges.map { case (a, b) => a + b }).distinct
    toks.zipWithIndex.toMap
  }
}
