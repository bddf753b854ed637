package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Density-based spatial clustering — distributed DBSCAN (Ester et al.
 * 1996; the PostGIS `ST_ClusterDBSCAN` semantics, which the reference
 * engine does not expose — a beyond-reference analytics operator built
 * by composing two already-certified kernels).
 *
 * Definitions (classic DBSCAN):
 *   - N_eps(p) = points within distance eps of p, INCLUDING p itself;
 *   - p is a CORE point iff |N_eps(p)| >= minPts;
 *   - core points within eps of each other share a cluster (the
 *     transitive closure of core-core eps-adjacency);
 *   - a BORDER point is a non-core point with >= 1 core neighbor — it
 *     joins a neighboring core's cluster;
 *   - everything else is NOISE.
 *
 * Spark-first decomposition:
 *   1. eps-neighbor candidate pairs via the grid EQUI-join
 *      ([[SpatialJoin.join]] st_dwithin — cell-id shuffle, reference-
 *      point dedup, AQE skew handling; never an all-pairs product);
 *   2. per-point neighbor counts = one partial-aggregating groupBy;
 *   3. core-core edges → [[LinkGraph.connectedComponents]]' large-star/
 *      small-star loop (edge-sized exchanges, O(log n) rounds, min-id
 *      labels);
 *   4. every point with a core neighbor takes the MINIMUM cluster label
 *      among its core neighbors (deterministic — PostGIS leaves border
 *      assignment arbitrary; for a core point this minimum is provably
 *      its own component label, so one pass labels cores and borders).
 *
 * Determinism: cluster labels are the minimum point id of the core
 * component (content-stable across partitionings, reruns and engines);
 * border ties break to the smallest label. Noise rows keep a NULL
 * cluster.
 *
 * Scale shape at 100 TB: the only corpus-sized exchanges are the grid
 * join's cell shuffle and the per-id aggregates; component iteration
 * touches core-core EDGES only (bounded by candidate pairs, which eps
 * and cellSize bound per cell); no driver-side graph state. Density
 * skew (a dense downtown cell) is the grid join's documented hot-cell
 * case — AQE splits the skewed cell partitions.
 */
object SpatialCluster {

  /**
   * @param id       integral point id (labels are min ids)
   * @param geom     geometry column (any type st_dwithin accepts)
   * @param eps      neighborhood radius (planar distance, coordinate units)
   * @param minPts   minimum |N_eps| (self included) for a core point
   * @param cellSize grid cell edge for the candidate join; <= 0 → eps
   * @return (id, is_core, cluster) — cluster is NULL for noise
   */
  def dbscan(df: DataFrame, id: Column, geom: Column, eps: Double, minPts: Int,
      cellSize: Double = 0.0): DataFrame = {
    require(eps > 0, "eps must be positive")
    require(minPts >= 1, "minPts must be >= 1")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val pts = df.select(id.cast("long").as("id"), geom.as("__g"))
    val rhs = df.select(id.cast("long").as("nbr_id"), geom.as("__ng"))
    // candidate pairs (self-pair included: dwithin(p, p, eps) is true),
    // reused by the count, the core-edge and the labeling passes —
    // persisted so the grid join runs once
    val pairs = SpatialJoin.join(pts, rhs, col("__g"), col("__ng"), "st_dwithin",
        cellSize = if (cellSize > 0) cellSize else eps, distance = eps)
      .select(col("id"), col("nbr_id"))
      .persist(lvl)
    val counts = pairs.groupBy("id").agg(count(lit(1)).as("__n")).persist(lvl)
    val cores = counts.filter(col("__n") >= minPts).select("id").persist(lvl)
    val coreEdges = pairs
      .join(cores, Seq("id"))
      .join(cores.select(col("id").as("nbr_id")), Seq("nbr_id"))
      .filter(col("id") =!= col("nbr_id"))
    val coreLabels = LinkGraph.connectedComponents(
      coreEdges, col("id"), col("nbr_id"))
      // isolated cores (no core neighbor) never appear in the edge
      // list — they still anchor their own cluster
      .unionByName(cores.select(col("id"), col("id").as("cluster")))
      .groupBy("id").agg(min("cluster").as("cluster"))
    // min core-neighbor label: labels borders, and re-derives each
    // core's own component label (its core neighbors all share it)
    val labels = pairs
      .join(cores.select(col("id").as("nbr_id")), Seq("nbr_id"))
      .join(coreLabels.select(col("id").as("nbr_id"), col("cluster")), Seq("nbr_id"))
      .groupBy("id").agg(min("cluster").as("cluster"))
    // materialize the (id-sized) result, then free the corpus-sized
    // intermediates — the duplicateClusters persist discipline; without
    // this every dbscan call leaks three cached frames for the
    // application lifetime
    val result = counts.join(labels, Seq("id"), "left")
      .select(col("id"), (col("__n") >= lit(minPts.toLong)).as("is_core"),
        col("cluster"))
      .persist(lvl)
    result.count()
    pairs.unpersist(blocking = false)
    counts.unpersist(blocking = false)
    cores.unpersist(blocking = false)
    result
  }

  /**
   * Distance-based agglomeration — the PostGIS `ST_ClusterWithin`
   * semantics: geometries whose pairwise distance chains stay within
   * `dist` share a cluster (the transitive closure of dwithin
   * adjacency). Exactly [[dbscan]] with minPts = 1 — every geometry is
   * core, nothing is noise — so it inherits the same grid-join +
   * large-star/small-star scale shape and min-id label determinism.
   * Returns (id, cluster); singletons cluster with themselves.
   */
  def clusterWithin(df: DataFrame, id: Column, geom: Column, dist: Double,
      cellSize: Double = 0.0): DataFrame =
    dbscan(df, id, geom, eps = dist, minPts = 1, cellSize = cellSize)
      .select(col("id"), col("cluster"))

  /**
   * Intersection-based agglomeration — the PostGIS
   * `ST_ClusterIntersecting` semantics: the transitive closure of
   * st_intersects adjacency (geometries that touch or overlap share a
   * cluster). Not a [[clusterWithin]](0) alias: the closure runs the
   * real prepared-geometry st_intersects predicate through the grid
   * equi-join (envelope-overlap candidates → exact predicate), so
   * overlapping polygons and shared-boundary touches cluster exactly
   * as the predicate defines, with no distance computation in the hot
   * path. Scale shape: identical to [[dbscan]] minPts=1 — one
   * grid-cell shuffle for candidates, edge-sized large-star/small-star
   * rounds, min-point-id deterministic labels. Returns (id, cluster);
   * geometries intersecting nothing cluster with themselves.
   */
  def clusterIntersecting(df: DataFrame, id: Column, geom: Column,
      cellSize: Double = 0.0): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val pts = df.select(id.cast("long").as("id"), geom.as("__g"))
    val rhs = df.select(id.cast("long").as("nbr_id"), geom.as("__ng"))
    val edges = SpatialJoin.join(pts, rhs, col("__g"), col("__ng"), "st_intersects",
        cellSize = cellSize)
      .select(col("id"), col("nbr_id"))
      .filter(col("id") =!= col("nbr_id"))
      .persist(lvl)
    val result = LinkGraph.connectedComponents(edges, col("id"), col("nbr_id"))
      // singletons never appear in the edge list — self-label them
      .unionByName(pts.select(col("id"), col("id").as("cluster")))
      .groupBy("id").agg(min("cluster").as("cluster"))
      .persist(lvl)
    result.count() // materialize before freeing the corpus-sized edges
    edges.unpersist(blocking = false)
    result
  }

  /**
   * Spatial k-means — the PostGIS `ST_ClusterKMeans` shape, made
   * deterministic: [[Similarity.kmeansMicro]]'s exact-integer Lloyd
   * loop (content-stable k-smallest-id seeding, micro-unit centroid
   * arithmetic, lowest-index tie-breaks) over the (x, y) coordinate
   * pair of each geometry's point. Inherits kmeansMicro's scale shape:
   * one scan + one k·2-key partial aggregate per iteration, centroids
   * driver-held (model-sized). Returns (id, cluster 0..k-1).
   */
  def kmeans(df: DataFrame, id: Column, geom: Column, k: Int = 8,
      iters: Int = 2): DataFrame = {
    import graft.GeoFunctions.{st_x, st_y}
    Similarity.kmeansMicro(
      df.select(id.as("__id"), array(st_x(geom), st_y(geom)).as("__xy")),
      col("__id"), col("__xy"), k, iters)
  }
}
