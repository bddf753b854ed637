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
 * components loop in [[Dedup]]. (A lazier single-final-job variant
 * was measured 3x slower — see the note inside [[pageRankMicro]].)
 */
object LinkGraph {

  /** Vertex-frame broadcast ceiling for the iterative loops: below
   *  this the per-round (vertex, state) frame broadcasts (16 bytes a
   *  row → ≤ ~32 MB) and the edge join plans exchange-free; above
   *  it, the pre-partitioned edge cache keeps the shuffle
   *  vertex-sized. A/B at 10M edges / 100k vertices (PLANS.md r9):
   *  broadcast ≈ flat locally (13-14 s both, same session), so the
   *  ceiling is sized for the CLUSTER tradeoff — a per-round 32 MB
   *  ship to every executor is the accepted cost band for the
   *  "small frontier" regime of web-graph analytics, while 160 MB ×
   *  rounds × executors would not be. */
  val BroadcastMaxVertices = 2000000L

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
    // ONE exchange builds the edge cache, keyed by the PER-ITERATION
    // AGGREGATION key dst (labelPropagation's r9 lesson applied here,
    // r10): hash(dst) also satisfies the (src,dst) distinct grouping
    // (partition exprs ⊆ grouping is enough for Catalyst), so dedup
    // rides the same exchange.
    val e = edges.select(src.cast("long").as("src"), dst.cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .repartition(col("dst")).distinct().persist()
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg")).persist()
    val vertices = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct().persist()
    val baseTerm = baseMicro * (100L - damping) / 100L
    // Per-iteration persist + materializing count is INTENTIONAL and
    // measured: collapsing the loop into one lazy final job (letting
    // the 5-iteration lineage evaluate in a single action) ran 3x
    // SLOWER at 10M edges — within one job, stage-parallel branches
    // referencing the cached e/outDeg/vertices frames race the cache
    // population and recompute the edge distinct shuffle repeatedly.
    // One count per iteration pins each rank frame before the next
    // round reads it, so every shared frame is computed exactly once.
    var ranks = vertices.select(col("v"), lit(baseMicro).as("rank_micro")).persist()
    // size-based dispatch, as in labelPropagation: below the threshold
    // the per-src contribution RATE frame (vertex-sized: ranks ⋈ outDeg
    // is a co-partitioned hash(v)=hash(src) join) broadcasts into the
    // dst-partitioned edge scan, and the whole iteration — probe,
    // groupBy(dst), vertices left-join — runs with ZERO edge-sized
    // exchanges. Above it, the classic shuffled join path.
    val bcastRates = vertices.count() <= BroadcastMaxVertices
    var i = 0
    while (i < iterations) {
      val rates = ranks
        .join(outDeg, ranks("v") === outDeg("src"))
        .select(col("src"), expr("rank_micro DIV deg").as("rate"))
      val rateSide = if (bcastRates) broadcast(rates) else rates
      val contribs = e.join(rateSide, "src")
        .select(col("dst").as("v"), col("rate").as("c"))
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
   * Triangle count per vertex (+ a `total` via summing / 3 on the
   * caller side if wanted). Triangles are the standard local
   * clustering / community-density signal over host link graphs.
   *
   * Scale shape — the degree-ordered orientation that bounds the
   * quadratic: undirected edges are canonicalized and then DIRECTED
   * from the lower-(degree, id) endpoint to the higher one, so every
   * triangle is counted exactly once at its smallest vertex and the
   * wedge join fans out from each vertex's FORWARD degree only —
   * O(Σ d_fwd²) with d_fwd ≤ √(2·|E|) on any graph, instead of the
   * hub-degree² blowup a naive neighbor join hits on power-law
   * graphs. Two equi-joins on vertex keys (wedge build + closing-edge
   * check), ids-only shuffles throughout.
   *
   * Returns (v BIGINT, n_triangles BIGINT) for every vertex incident
   * to ≥1 triangle.
   */
  def triangleCounts(edges: DataFrame, src: Column, dst: Column): DataFrame = {
    // canonical undirected edge set, self-loops dropped
    val und = edges.select(src.cast("long").as("a"), dst.cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()
    val deg = und.select(col("a").as("v")).unionAll(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    // orient by (degree, id): u -> w iff (d_u, u) < (d_w, w)
    val withDeg = und
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
    val dir = withDeg.select(
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("w")))
        .otherwise(struct(col("b").as("u"), col("a").as("w")))
        .as("e"))
      .select(col("e.u").as("u"), col("e.w").as("w"))
      .persist()
    // wedges u->w1, u->w2 with the pair id-ordered so the closing edge
    // can be matched on its CANONICAL (min, max) form with a pure
    // equi-join (an OR of orientations would plan a nested loop)
    val e1 = dir.select(col("u"), col("w").as("w1"))
    val e2 = dir.select(col("u"), col("w").as("w2"))
    val wedges = e1.join(e2, "u").filter(col("w1") < col("w2"))
    val closing = dir.select(least(col("u"), col("w")).as("w1"),
      greatest(col("u"), col("w")).as("w2"))
    val tris = wedges.join(closing, Seq("w1", "w2"))
      .select(col("u"), col("w1"), col("w2"))
    // Materialize eagerly (while dir is still cached — its three
    // references share the cache within this one job) into a LOCAL
    // CHECKPOINT rather than a persist: checkpoint blocks are released
    // when the frame is garbage-collected, so repeated calls (bench
    // warmups, query reruns) don't accumulate CacheManager entries for
    // the session lifetime. Trade-off: lineage is truncated, so an
    // executor loss during a later read recomputes nothing — the
    // caller must re-run the operator (acceptable for a terminal
    // result frame that is typically written out immediately).
    val out = tris.select(explode(array(col("u"), col("w1"), col("w2"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_triangles"))
      .localCheckpoint(eager = true)
    dir.unpersist(blocking = false)
    out
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
  /**
   * Synchronous label propagation (community detection — the classic
   * RAK algorithm in its deterministic batch form): labels start as
   * the vertex id; each round every vertex adopts the most frequent
   * label among its neighbors, ties to the SMALLEST label; fixed round
   * count. All integer, all deterministic — the oracle replays the
   * identical rounds as unrolled CTEs with the same
   * (count desc, label asc) argmax.
   *
   * Scale shape mirrors [[pageRankMicro]]: the per-round work is one
   * edge-sized equi-join carrying (vertex, label) pairs only, a
   * (vertex, label) partial-aggregating count, and a max_by argmax per
   * vertex — ids-only exchanges, per-round persist+count pinning (the
   * measured 3× lazy-loop lesson at LinkGraph.scala:50-57 applies
   * unchanged).
   *
   * Returns (v BIGINT, label BIGINT).
   */
  def labelPropagation(edges: DataFrame, src: Column, dst: Column,
      rounds: Int = 3): DataFrame = {
    require(rounds >= 0, "labelPropagation: rounds >= 0")
    // undirected: both directions, self-loops dropped, dedup
    val e0 = edges.select(src.cast("long").as("a"), dst.cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    // ONE exchange builds the cache: repartition(a) BEFORE distinct —
    // hash(a) clustering satisfies the (a,b) dedup grouping, the
    // vertex dedup below, and (through a broadcast join, which
    // preserves the streamed side's partitioning) both per-round
    // groupings ((a,label) then (a)). The previous
    // distinct-then-repartition shape paid a second full edge-sized
    // exchange for nothing.
    val e1 = e0.unionAll(e0.select(col("b").as("a"), col("a").as("b")))
      .repartition(col("a")).distinct().persist()
    val vertices = e1.select(col("a").as("v")).distinct().persist()
    var labels = vertices.select(col("v"), col("v").as("label")).persist()
    // size-based join dispatch: the labels frame is vertex-sized, and
    // below the threshold a per-round BROADCAST deletes the join
    // exchange entirely (the vertex count is already materialized by
    // the pinning counts, so the probe is free) and every round runs
    // with ZERO exchanges on the a-partitioned cache. Above it, the
    // edge cache is re-partitioned by `b`, the per-round join key, so
    // only the vertex-sized labels frame shuffles per round.
    val vCount = vertices.count()
    val bcastLabels = vCount <= BroadcastMaxVertices
    val e = if (bcastLabels) e1 else {
      val r = e1.repartition(col("b")).persist()
      r.count() // pin before releasing the parent
      e1.unpersist(blocking = false)
      r
    }
    var i = 0
    while (i < rounds) {
      // round 1's labels are the identity map, so the neighbor's label
      // IS b — skip the join entirely (one broadcast + probe saved)
      val neighborVotes = (if (i == 0)
          e.select(col("a").as("v"), col("b").as("label"))
        else {
          val labSide = if (bcastLabels) broadcast(labels) else labels
          e.join(labSide, e("b") === labSide("v"))
            .select(e("a").as("v"), labSide("label"))
        }).groupBy("v", "label").agg(count(lit(1)).as("n"))
      // argmax by (n desc, label asc) as max() of ONE DECIMAL(38,0)
      // encoding n*2^64 + (2^63-1-label): max_by over a tie struct
      // plans a SortAggregate (a per-round sort of the edge-sized vote
      // frame — measured ~2x the whole round's cost at 10M edges),
      // while scalar max stays in HashAggregate. The encoding is
      // exact for every Long label (the old -label negation also
      // overflowed at Long.MinValue) and for counts up to 2^53.
      val enc = expr(
        """CAST(n AS DECIMAL(38,0)) * 18446744073709551616 +
           (CAST(9223372036854775807 AS DECIMAL(38,0)) - CAST(label AS DECIMAL(38,0)))""")
      val next = neighborVotes
        .groupBy("v")
        .agg(max(enc).as("__enc"))
        .select(col("v"), expr(
          """CAST(CAST(9223372036854775807 AS DECIMAL(38,0)) -
             (__enc % 18446744073709551616) AS BIGINT)""").as("label"))
        .persist()
      next.count() // pin before releasing the parent (measured lesson)
      labels.unpersist(blocking = false)
      labels = next
      i += 1
    }
    e.unpersist(blocking = false); vertices.unpersist(blocking = false)
    labels
  }

  /**
   * k-core subgraph via synchronous peeling: each round removes every
   * vertex whose degree in the CURRENT subgraph is below `k`, until a
   * fixed point (the k-core — the classic link-graph quality filter:
   * keep only densely-embedded hosts/documents). Returns the
   * surviving vertices with their in-core degree (v BIGINT,
   * deg BIGINT); empty when the graph has no k-core.
   *
   * Scale shape per round: one degree aggregate over the cached
   * edge frame (pre-partitioned by endpoint, so the aggregate and the
   * two semi-join filters all reuse that distribution — only the
   * vertex-sized keep frame shuffles) and one edge filter; the edge
   * frame only ever shrinks. The keep-count is compared round-over-
   * round: the alive set shrinks monotonically, so an unchanged count
   * IS the fixed point, and early exit is safe because a stable set
   * stays stable under further peeling. `maxRounds` is a safety
   * valve for adversarial chains (a k=2 path peels one layer per
   * round); if it trips, the result is the `maxRounds`-step peel,
   * a superset of the true core.
   */
  def kCore(edges: DataFrame, src: Column, dst: Column, k: Int,
      maxRounds: Int = 30): DataFrame = {
    require(k >= 1 && maxRounds >= 1, "kCore: k >= 1 and maxRounds >= 1")
    val e0 = edges.select(src.cast("long").as("a"), dst.cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    var e = e0.unionAll(e0.select(col("b").as("a"), col("a").as("b")))
      .distinct().repartition(col("a")).persist()
    e.count() // pin before the loop (same measured lesson as labelProp)
    var rounds = 0
    var done = false
    var lastAlive = -1L
    while (!done && rounds < maxRounds) {
      val keep = e.groupBy("a").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("a").as("v")).persist()
      val n = keep.count()
      if (n == lastAlive) { done = true; keep.unpersist(blocking = false) }
      else {
        lastAlive = n
        val next = e.join(keep, e("a") === keep("v")).drop("v")
          .join(keep.select(col("v").as("w")), col("b") === col("w")).drop("w")
          .repartition(col("a")).persist()
        next.count()
        e.unpersist(blocking = false); keep.unpersist(blocking = false)
        e = next
        rounds += 1
      }
    }
    // localCheckpoint (not persist) so the final cached edge frame can
    // be released here without losing the result — same cache-leak
    // discipline as triangleCounts
    val out = e.groupBy("a").agg(count(lit(1)).as("deg"))
      .select(col("a").as("v"), col("deg"))
      .localCheckpoint(eager = true)
    e.unpersist(blocking = false)
    out
  }

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
