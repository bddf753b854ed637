package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Link-graph quality priors for web corpora (the PageRank-family
 * domain weighting used as a pretraining quality signal — e.g. the
 * CommonCrawl-derived corpora that weight documents by host rank).
 *
 * All arithmetic is EXACT BIGINT micro-units — ranks are integers,
 * contributions use integer division, damping is an integer
 * percentage — so the fixed-point iteration is bit-identical across
 * engines, partitionings and reruns (a double-precision PageRank sums
 * in nondeterministic order and can never be hash-certified).
 *
 * Scale shape per iteration: one equi-join of the rank frame onto the
 * edge list (both keyed by vertex — at 100 TB this is the standard
 * edge-partitioned power iteration), one partial-aggregating groupBy,
 * and a base-term union; ranks/edges persist across iterations and
 * the previous iteration unpersists, mirroring the connected-
 * components loop in [[Dedup]].
 */
object LinkGraph {

  /**
   * Fixed-point PageRank in micro-units. `damping` is a percentage
   * (85 = 0.85); every vertex starts at `baseMicro`; each iteration:
   *
   *   rank'(v) = (baseMicro * (100 - damping)) / 100
   *            + (damping * Σ_{u→v} rank(u) / outdeg(u)) / 100
   *
   * with `/` = integer floor division on non-negative values. Dangling
   * vertices keep contributing nothing (the simplified leak variant;
   * both engines implement the same recurrence). Returns
   * (vertex BIGINT, rank_micro BIGINT).
   */
  def pageRankMicro(
      edges: DataFrame, src: Column, dst: Column,
      iterations: Int = 5, damping: Int = 85,
      baseMicro: Long = 1000000000L): DataFrame = {
    require(iterations >= 1 && damping >= 0 && damping <= 100, "bad pagerank params")
    val e = edges.select(src.cast("long").as("src"), dst.cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct().persist()
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg")).persist()
    val vertices = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct().persist()
    val baseTerm = baseMicro * (100L - damping) / 100L
    var ranks = vertices.select(col("v"), lit(baseMicro).as("rank_micro")).persist()
    var i = 0
    while (i < iterations) {
      val contribs = ranks
        .join(outDeg, ranks("v") === outDeg("src"))
        .join(e, "src")
        .select(col("dst").as("v"),
          expr("rank_micro DIV deg").as("c"))
        .groupBy("v").agg(sum(col("c")).as("in_sum"))
      val next = vertices
        .join(contribs, Seq("v"), "left")
        .select(col("v"),
          (lit(baseTerm) + expr(s"$damping * coalesce(in_sum, 0L) DIV 100"))
            .as("rank_micro"))
        .persist()
      next.count() // materialize before releasing the parent
      ranks.unpersist(blocking = false)
      ranks = next
      i += 1
    }
    e.unpersist(blocking = false); outDeg.unpersist(blocking = false)
    vertices.unpersist(blocking = false)
    ranks
  }

  /**
   * Connected components over an arbitrary edge list: (id, cluster)
   * with cluster = the smallest node id in the component. Delegates to
   * the certified large-star/small-star loop behind the transitive
   * dedup clustering ([[Dedup.duplicateClusters]]) — edge-list-only
   * shuffles, map-side-combined min reductions, O(log n) rounds,
   * per-round persist/unpersist. The general-graph entry point for
   * everything that isn't a dup graph (host graphs, citation webs,
   * entity resolution).
   */
  def connectedComponents(edges: org.apache.spark.sql.DataFrame,
      src: org.apache.spark.sql.Column, dst: org.apache.spark.sql.Column,
      maxRounds: Int = 25): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val nodes = edges.select(src.cast("long").as("id"))
      .unionAll(edges.select(dst.cast("long").as("id"))).distinct()
    Dedup.duplicateClusters(nodes,
      edges.select(src.cast("long").as("id_a"), dst.cast("long").as("id_b")),
      maxRounds)
  }
}
