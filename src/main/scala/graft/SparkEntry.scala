package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Driver contract (see repo prompt + SURVEY.md §7): `queries` exposes
 * one entry per implemented operator family; `oracleSql` gives an
 * equivalent DuckDB SQL text evaluated on the same parquet tables.
 *
 * Conventions for oracle-comparable results:
 *  - geometry is synthesized deterministically from numeric columns
 *    (the driver's TPC-H-ish testdata has no geometry columns);
 *    coordinates get +0.5 offsets so predicate results never depend
 *    on boundary-inclusion semantics
 *  - double aggregations go through DECIMAL casts (FP sum order
 *    differs between engines); scalar double math uses the identical
 *    operation sequence on both sides so results are bit-exact
 *  - every query ORDER BYs a unique key (row order stability)
 */
object SparkEntry {

  private val loaded = scala.collection.mutable.Set[(SparkSession, String, String)]()

  private def load(s: SparkSession, dir: String, names: String*): Unit = synchronized {
    Graft.install(s)
    // events.parquet carries TIMESTAMP(NANOS); Spark 4 rejects it unless
    // read as raw long (we convert back to timestamp in the query)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    names.foreach { n =>
      if (loaded.add((s, dir, n))) // skip re-reading footers per query
        s.read.parquet(s"$dir/$n.parquet").createOrReplaceTempView(n)
    }
  }

  private def q(tables: Seq[String], sql: String): (SparkSession, String) => DataFrame =
    (s, dir) => { load(s, dir, tables: _*); s.sql(sql) }

  /** Flagship: grid spatial join (points-in-zones) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_geo_spatial_join")(spark, "/root/testdata/sf0.001")

  // ---- shared synthetic-geometry SQL fragments (Spark dialect) ----------
  // customer point: strictly-interior coords in [0.5, 99.5]
  private val custPt = "ST_Point(CAST(c_custkey % 100 AS DOUBLE) + 0.5, CAST((c_custkey * 7) % 100 AS DOUBLE) + 0.5)"
  // same in DuckDB dialect (identical arithmetic)
  private val custPtX = "(CAST(c_custkey % 100 AS DOUBLE) + 0.5)"
  private val custPtY = "(CAST((c_custkey * 7) % 100 AS DOUBLE) + 0.5)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ================= relational substrate (SURVEY §2.9) ==============
    "q1_agg" -> q(Seq("lineitem"),
      """SELECT l_returnflag, l_linestatus,
         sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sum_qty_c,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sum_base_price_c,
         sum(CAST(round(l_discount * 10000) AS BIGINT)) AS sum_disc_c,
         count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus"""),

    "q_join_revenue" -> q(Seq("customer", "orders", "lineitem", "nation"),
      """SELECT n_name,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS revenue_c4,
         count(*) AS n_items
         FROM customer JOIN nation ON c_nationkey = n_nationkey
           JOIN orders ON o_custkey = c_custkey
           JOIN lineitem ON l_orderkey = o_orderkey
         GROUP BY n_name ORDER BY n_name"""),

    "q_window_rank" -> q(Seq("orders"),
      """SELECT o_custkey, o_orderkey, rnk FROM (
           SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
           FROM orders WHERE o_custkey < 200)
         WHERE rnk <= 3 ORDER BY o_custkey, rnk"""),

    "q_topk" -> q(Seq("orders"),
      """SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price
         FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""),

    "q_distinct" -> q(Seq("orders", "lineitem"),
      """SELECT (SELECT count(DISTINCT o_custkey) FROM orders) AS n_custs,
                (SELECT count(DISTINCT l_returnflag || '|' || l_linestatus) FROM lineitem) AS n_flag_pairs"""),

    "q_rollup" -> q(Seq("lineitem"),
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
         sum(CAST(round(l_quantity * 100) AS BIGINT)) AS qty_c
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""),

    "q_semi_anti" -> q(Seq("customer", "orders"),
      """SELECT
           (SELECT count(*) FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS with_orders,
           (SELECT count(*) FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS without_orders"""),

    "q_setop" -> q(Seq("customer", "supplier"),
      """SELECT count(*) AS n FROM
           (SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier)"""),

    // hour rendered as a string: Spark writes parquet TIMESTAMP adjusted
    // to session TZ while DuckDB's is naive → the two hash differently
    // even for equal instants. Formatting on both sides sidesteps it.
    "q_events_hourly" -> q(Seq("events"),
      """SELECT date_format(date_trunc('hour', timestamp_micros(ts DIV 1000)), 'yyyy-MM-dd HH:mm:ss') AS hour,
         event_type, count(*) AS n,
         sum(CAST(round(value * 10000) AS BIGINT)) AS sum_value_c
         FROM events GROUP BY 1, 2 ORDER BY 1, 2"""),

    "q_string_funcs" -> q(Seq("customer"),
      """SELECT c_custkey, upper(substring(c_name, 1, 8)) AS pfx, length(c_name) AS len,
         CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bucket
         FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey"""),

    // ================= spatial surface (SURVEY §2.1-2.5) ===============
    "q_geo_accessors" -> q(Seq("customer"),
      s"""SELECT c_custkey, ST_X($custPt) AS x, ST_Y($custPt) AS y,
          ST_XMin($custPt) AS xmin, ST_YMax($custPt) AS ymax
          FROM customer WHERE c_custkey <= 300 ORDER BY c_custkey"""),

    "q_geo_astext" -> q(Seq("customer"),
      s"""SELECT c_custkey, ST_AsText($custPt) AS wkt, ST_AsGeoJSON($custPt) AS gj
          FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey"""),

    "q_geo_envelope" -> q(Seq("part"),
      """SELECT p_partkey,
         ST_Area(ST_MakeEnvelope(0.0, 0.0, CAST(p_size % 10 + 1 AS DOUBLE), CAST(p_partkey % 7 + 1 AS DOUBLE))) AS area,
         ST_Perimeter(ST_MakeEnvelope(0.0, 0.0, CAST(p_size % 10 + 1 AS DOUBLE), CAST(p_partkey % 7 + 1 AS DOUBLE))) AS peri,
         ST_X(ST_Centroid(ST_MakeEnvelope(0.0, 0.0, CAST(p_size % 10 + 1 AS DOUBLE), CAST(p_partkey % 7 + 1 AS DOUBLE)))) AS cx,
         ST_NPoints(ST_MakeEnvelope(0.0, 0.0, CAST(p_size % 10 + 1 AS DOUBLE), CAST(p_partkey % 7 + 1 AS DOUBLE))) AS np
         FROM part WHERE p_partkey <= 400 ORDER BY p_partkey"""),

    "q_geo_contains" -> q(Seq("customer"),
      s"""SELECT count(*) AS n FROM customer
          WHERE ST_Within($custPt, ST_MakeEnvelope(10.0, 10.0, 80.0, 80.0))"""),

    "q_geo_intersects" -> q(Seq("orders"),
      """SELECT o_orderkey,
         ST_Intersects(
           ST_MakeEnvelope(CAST(o_orderkey % 50 AS DOUBLE), CAST(o_orderkey % 30 AS DOUBLE),
                           CAST(o_orderkey % 50 + 10 AS DOUBLE), CAST(o_orderkey % 30 + 10 AS DOUBLE)),
           ST_MakeEnvelope(CAST(o_orderkey % 40 + 5 AS DOUBLE), CAST(o_orderkey % 20 + 5 AS DOUBLE),
                           CAST(o_orderkey % 40 + 15 AS DOUBLE), CAST(o_orderkey % 20 + 15 AS DOUBLE))) AS hit
         FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey"""),

    "q_geo_line" -> q(Seq("supplier"),
      """SELECT s_suppkey,
         ST_Length(ST_MakeLine(
           ST_Point(CAST(s_suppkey % 37 AS DOUBLE), CAST(s_suppkey % 23 AS DOUBLE)),
           ST_Point(CAST(s_suppkey % 53 AS DOUBLE), CAST(s_suppkey % 41 AS DOUBLE)))) AS len,
         ST_Distance(
           ST_Point(CAST(s_suppkey % 37 AS DOUBLE), CAST(s_suppkey % 23 AS DOUBLE)),
           ST_Point(CAST(s_suppkey % 53 AS DOUBLE), CAST(s_suppkey % 41 AS DOUBLE))) AS dist,
         ST_NPoints(ST_MakeLine(
           ST_Point(CAST(s_suppkey % 37 AS DOUBLE), CAST(s_suppkey % 23 AS DOUBLE)),
           ST_Point(CAST(s_suppkey % 53 AS DOUBLE), CAST(s_suppkey % 41 AS DOUBLE)))) AS np
         FROM supplier ORDER BY s_suppkey"""),

    "q_geo_extent_agg" -> q(Seq("customer"),
      s"""SELECT ST_XMin(e) AS xmin, ST_YMin(e) AS ymin, ST_XMax(e) AS xmax, ST_YMax(e) AS ymax
          FROM (SELECT ST_Extent_Agg($custPt) AS e FROM customer)"""),

    "q_geo_union_agg" -> q(Seq("nation"),
      """SELECT ST_Area(ST_Union_Agg(
           ST_MakeEnvelope(CAST(n_nationkey % 5 * 30 AS DOUBLE), CAST(n_nationkey DIV 5 * 30 AS DOUBLE),
                           CAST(n_nationkey % 5 * 30 + 20 AS DOUBLE), CAST(n_nationkey DIV 5 * 30 + 20 AS DOUBLE)))) AS total_area
         FROM nation"""),

    "q_geo_spatial_join" -> ((s, dir) => {
      load(s, dir, "customer", "nation")
      import org.apache.spark.sql.functions._
      import graft.GeoFunctions._
      val pts = s.table("customer").select(col("c_custkey"),
        st_point(expr("CAST(c_custkey % 100 AS DOUBLE) + 0.5"),
          expr("CAST((c_custkey * 7) % 100 AS DOUBLE) + 0.5")).as("pt"))
      val zones = s.table("nation").select(col("n_nationkey").as("zid"),
        st_makeenvelope(expr("CAST(n_nationkey % 5 * 20 AS DOUBLE)"), expr("CAST(n_nationkey DIV 5 * 20 AS DOUBLE)"),
          expr("CAST(n_nationkey % 5 * 20 + 20 AS DOUBLE)"), expr("CAST(n_nationkey DIV 5 * 20 + 20 AS DOUBLE)")).as("zone"))
      operators.SpatialJoin.join(pts, zones, col("pt"), col("zone"), "st_within", cellSize = 20.0)
        .groupBy("zid").agg(count("*").as("n_points"))
        .orderBy("zid")
    }),

    "q_geo_transform" -> q(Seq("customer"),
      """SELECT c_custkey,
         round(ST_X(ST_Transform(ST_Point(CAST(c_custkey % 360 AS DOUBLE) - 179.5, CAST(c_custkey % 160 AS DOUBLE) - 79.5),
           'EPSG:4326', 'EPSG:3857', true)), 4) AS mx,
         round(ST_Y(ST_Transform(ST_Point(CAST(c_custkey % 360 AS DOUBLE) - 179.5, CAST(c_custkey % 160 AS DOUBLE) - 79.5),
           'EPSG:4326', 'EPSG:3857', true)), 4) AS my
         FROM customer WHERE c_custkey <= 300 ORDER BY c_custkey"""),

    "q_geo_haversine" -> q(Seq("customer"),
      """SELECT c_custkey,
         round(ST_Distance_Sphere(
           ST_Point(CAST(c_custkey % 300 AS DOUBLE) - 150.0, CAST(c_custkey % 140 AS DOUBLE) - 70.0),
           ST_Point(CAST((c_custkey + 37) % 300 AS DOUBLE) - 150.0, CAST((c_custkey + 53) % 140 AS DOUBLE) - 70.0)), 4) AS d
         FROM customer WHERE c_custkey <= 300 ORDER BY c_custkey"""),

    "q_geo_overlay" -> q(Seq("part"),
      """SELECT p_partkey,
         ST_Area(ST_Intersection(
           ST_MakeEnvelope(0.0, 0.0, CAST(p_size % 10 + 3 AS DOUBLE), CAST(p_partkey % 7 + 3 AS DOUBLE)),
           ST_MakeEnvelope(CAST(p_partkey % 5 AS DOUBLE), CAST(p_size % 4 AS DOUBLE),
                           CAST(p_partkey % 5 + 4 AS DOUBLE), CAST(p_size % 4 + 5 AS DOUBLE)))) AS inter_area,
         ST_Area(ST_Union(
           ST_MakeEnvelope(0.0, 0.0, CAST(p_size % 10 + 3 AS DOUBLE), CAST(p_partkey % 7 + 3 AS DOUBLE)),
           ST_MakeEnvelope(CAST(p_partkey % 5 AS DOUBLE), CAST(p_size % 4 AS DOUBLE),
                           CAST(p_partkey % 5 + 4 AS DOUBLE), CAST(p_size % 4 + 5 AS DOUBLE)))) AS union_area,
         ST_Area(ST_Difference(
           ST_MakeEnvelope(0.0, 0.0, CAST(p_size % 10 + 3 AS DOUBLE), CAST(p_partkey % 7 + 3 AS DOUBLE)),
           ST_MakeEnvelope(CAST(p_partkey % 5 AS DOUBLE), CAST(p_size % 4 AS DOUBLE),
                           CAST(p_partkey % 5 + 4 AS DOUBLE), CAST(p_size % 4 + 5 AS DOUBLE)))) AS diff_area
         FROM part WHERE p_partkey <= 300 ORDER BY p_partkey"""),

    "q_geo_convexhull" -> q(Seq("supplier"),
      """SELECT s_suppkey,
         ST_Area(ST_ConvexHull(ST_Collect(array(
           ST_Point(0.0, 0.0),
           ST_Point(CAST(s_suppkey % 10 + 1 AS DOUBLE), 0.0),
           ST_Point(CAST(s_suppkey % 6 AS DOUBLE), CAST(s_suppkey % 8 + 1 AS DOUBLE)))))) AS hull_area,
         ST_NPoints(ST_ConvexHull(ST_Collect(array(
           ST_Point(0.0, 0.0),
           ST_Point(CAST(s_suppkey % 10 + 1 AS DOUBLE), 0.0),
           ST_Point(CAST(s_suppkey % 6 AS DOUBLE), CAST(s_suppkey % 8 + 1 AS DOUBLE)))))) AS hull_np
         FROM supplier ORDER BY s_suppkey"""),

    "q_geo_dwithin" -> q(Seq("customer"),
      """SELECT c_custkey,
         ST_DWithin(ST_Point(CAST(c_custkey % 20 AS DOUBLE), CAST(c_custkey % 30 AS DOUBLE)),
                    ST_Point(CAST(c_custkey % 23 AS DOUBLE), CAST(c_custkey % 17 AS DOUBLE)), 5.0) AS near
         FROM customer WHERE c_custkey <= 400 ORDER BY c_custkey"""),

    "q_native_box" -> ((s, dir) => {
      load(s, dir, "part")
      import org.apache.spark.sql.functions._
      import graft.functions.NativeGeo._
      val df = s.table("part").filter(col("p_partkey") <= 300)
        .withColumn("box", box2d(lit(0.0), lit(0.0),
          expr("CAST(p_size % 10 + 1 AS DOUBLE)"), expr("CAST(p_partkey % 7 + 1 AS DOUBLE)")))
        .withColumn("pt", point2d(expr("CAST(p_partkey % 12 AS DOUBLE)"), expr("CAST(p_partkey % 9 AS DOUBLE)")))
      df.select(col("p_partkey"), boxArea(col("box")).as("area"),
        boxPerimeter(col("box")).as("peri"),
        boxContainsPoint(col("box"), col("pt")).as("inside"))
        .orderBy("p_partkey")
    }),

    // no closed-form oracle → rows-only checks
    "q_geo_hilbert" -> q(Seq("customer"),
      s"""SELECT c_custkey,
          ST_Hilbert($custPtX, $custPtY, 0.0, 0.0, 100.0, 100.0) AS h
          FROM customer ORDER BY c_custkey"""),

    "q_geo_quadkey" -> q(Seq("customer"),
      """SELECT c_custkey,
         ST_QuadKey(CAST(c_custkey % 360 AS DOUBLE) - 179.5, CAST(c_custkey % 160 AS DOUBLE) - 79.5, 10) AS qk
         FROM customer WHERE c_custkey <= 300 ORDER BY c_custkey"""),

    "q_geo_buffer" -> q(Seq("customer"),
      s"""SELECT c_custkey, ST_Area(ST_Buffer($custPt, 2.0)) AS barea,
          ST_NPoints(ST_Buffer($custPt, 2.0)) AS bnp
          FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey"""),

    "q_geo_ops_roundtrip" -> q(Seq("customer"),
      s"""SELECT c_custkey,
          ST_AsText(ST_GeomFromWKB(ST_AsWKB($custPt))) AS wkt_rt,
          ST_AsText(ST_GeomFromText(ST_AsText($custPt))) AS wkt_rt2,
          ST_GeometryType($custPt) AS gtype,
          ST_IsEmpty($custPt) AS is_empty
          FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey"""),

    // ================= training-data pipeline ops ======================
    "q_doc_dedup_exact" -> q(Seq("documents"),
      """SELECT doc_id FROM (
           SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
           FROM documents) WHERE rn = 1 ORDER BY doc_id"""),

    "q_doc_tokens" -> q(Seq("documents"),
      """SELECT doc_id,
         size(regexp_extract_all(text, '\\w+', 0)) AS n_tokens,
         size(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]', 0)) AS n_subwords,
         length(text) AS n_chars_check
         FROM documents ORDER BY doc_id"""),

    "q_doc_quality" -> q(Seq("documents"),
      """SELECT doc_id,
         round(CAST(length(regexp_replace(text, '\\s', '')) AS DOUBLE)
               / size(regexp_extract_all(text, '\\w+', 0)), 6) AS mean_word_len,
         round(CAST(length(text) - length(regexp_replace(text, '[0-9]', '')) AS DOUBLE) / length(text), 6) AS digit_ratio,
         round(CAST(size(array_distinct(split(lower(text), '\\s+'))) AS DOUBLE)
               / size(split(lower(text), '\\s+')), 6) AS distinct_ratio
         FROM documents ORDER BY doc_id"""),

    "q_doc_jaccard_pairs" -> q(Seq("documents"),
      """WITH sh AS (
           SELECT doc_id, array_distinct(transform(sequence(1, greatest(size(split(trim(lower(text)), '\\s+')) - 2, 1)),
             i -> concat_ws(' ', slice(split(trim(lower(text)), '\\s+'), i, 3)))) AS s
           FROM documents)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(size(array_intersect(a.s, b.s)) AS DOUBLE) / size(array_union(a.s, b.s)), 6) AS jac
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         WHERE CAST(size(array_intersect(a.s, b.s)) AS DOUBLE) / size(array_union(a.s, b.s)) >= 0.5
         ORDER BY id_a, id_b"""),

    "q_doc_minhash_dedup" -> ((s, dir) => {
      load(s, dir, "documents")
      import org.apache.spark.sql.functions._
      // MinHash-LSH recall + exact string-shingle Jaccard precision:
      // result equals the oracle's brute-force jaccard dedup w.h.p.
      operators.Dedup.minhashDedup(s.table("documents"), col("doc_id"), col("text"),
          threshold = 0.7)
        .select(col("doc_id")).orderBy("doc_id")
    }),

    "q_emb_norm" -> q(Seq("embeddings"),
      """SELECT vec_id,
         round(sqrt(aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS l2
         FROM embeddings ORDER BY vec_id"""),

    "q_emb_topk" -> ((s, dir) => {
      load(s, dir, "embeddings")
      import org.apache.spark.sql.functions._
      val emb = s.table("embeddings")
      // broadcast the query set; corpus scanned once (no corpus shuffle);
      // CosineSimilarity expression evaluates the identical double
      // arithmetic sequence as the DuckDB oracle (dot / (|q|*|c|))
      val qs = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("embedding").as("__qv"))
      val scored = emb.select(col("vec_id").as("corpus_id"), col("embedding").as("__cv"))
        .crossJoin(broadcast(qs))
        .filter(col("corpus_id") =!= col("query_id"))
        .withColumn("__sim", operators.Similarity.cosine(col("__qv"), col("__cv")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(round(col("__sim"), 6).desc, col("corpus_id").asc)
      scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
        .select(col("query_id"), col("corpus_id"), round(col("__sim"), 6).as("sim"), col("rnk"))
        .orderBy("query_id", "rnk")
    }),

    // rows-only (custom sketches have no SQL-expressible oracle)
    "q_doc_simhash" -> ((s, dir) => {
      load(s, dir, "documents")
      import org.apache.spark.sql.functions._
      s.table("documents").select(col("doc_id"),
        operators.Dedup.simhash(col("text")).as("sig"),
        operators.Dedup.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    "q_doc_langid" -> ((s, dir) => {
      load(s, dir, "documents")
      import org.apache.spark.sql.functions._
      s.table("documents")
        .select(col("doc_id"), operators.TextOps.langId(col("text")).as("lang_pred"),
          round(operators.TextOps.qualityScore(col("text")), 4).as("quality"))
        .orderBy("doc_id")
    }),

    "q_emb_ann_pairs" -> ((s, dir) => {
      load(s, dir, "embeddings")
      import org.apache.spark.sql.functions._
      operators.Similarity.annPairs(s.table("embeddings"), col("vec_id"), col("embedding"),
        threshold = 0.35, numPlanes = 10, numTables = 6)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("id_a", "id_b")
    }),

    "q_mm_decode" -> ((s, dir) => {
      load(s, dir, "documents")
      import org.apache.spark.sql.functions._
      val media = s.table("documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      operators.Multimodal.decodeAndFeaturize(media, "doc_id", "payload", featureDim = 16)
        .select(col("media_id"), col("meta.format").as("format"),
          col("meta.width").as("w"), size(col("feature")).as("fdim"))
        .orderBy("media_id")
    })
  )

  /** DuckDB-dialect oracle SQL per query (omitted → rows-only check). */
  val oracleSql: Map[String, String] = {
    val duckCustX = custPtX
    val duckCustY = custPtY
    Map(
      // NOTE: DuckDB promotes sum(BIGINT) to HUGEINT (exported to Arrow as
      // decimal128) while Spark stays BIGINT → every oracle sum is cast
      // back to BIGINT so both sides hash as int64.
      "q1_agg" ->
        """SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
           CAST(sum(CAST(round(l_discount * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_c,
           count(*) AS count_order
           FROM lineitem
           WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
           GROUP BY l_returnflag, l_linestatus
           ORDER BY l_returnflag, l_linestatus""",

      "q_join_revenue" ->
        """SELECT n_name,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_c4,
           count(*) AS n_items
           FROM customer JOIN nation ON c_nationkey = n_nationkey
             JOIN orders ON o_custkey = c_custkey
             JOIN lineitem ON l_orderkey = o_orderkey
           GROUP BY n_name ORDER BY n_name""",

      "q_window_rank" ->
        """SELECT o_custkey, o_orderkey, rnk FROM (
             SELECT o_custkey, o_orderkey,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
             FROM orders WHERE o_custkey < 200) t
           WHERE rnk <= 3 ORDER BY o_custkey, rnk""",

      "q_topk" ->
        """SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price
           FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",

      "q_distinct" ->
        """SELECT (SELECT count(DISTINCT o_custkey) FROM orders) AS n_custs,
                  (SELECT count(DISTINCT l_returnflag || '|' || l_linestatus) FROM lineitem) AS n_flag_pairs""",

      "q_rollup" ->
        """SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_c
           FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
           ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",

      "q_semi_anti" ->
        """SELECT
             (SELECT count(*) FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS with_orders,
             (SELECT count(*) FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS without_orders""",

      "q_setop" ->
        """SELECT count(*) AS n FROM
             (SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier) t""",

      "q_events_hourly" ->
        """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type, count(*) AS n,
           CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS sum_value_c
           FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

      "q_string_funcs" ->
        """SELECT c_custkey, upper(substring(c_name, 1, 8)) AS pfx, length(c_name) AS len,
           CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bucket
           FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey""",

      "q_geo_accessors" ->
        s"""SELECT c_custkey, $duckCustX AS x, $duckCustY AS y,
            $duckCustX AS xmin, $duckCustY AS ymax
            FROM customer WHERE c_custkey <= 300 ORDER BY c_custkey""",

      "q_geo_astext" ->
        s"""SELECT c_custkey,
            'POINT (' || $duckCustX::VARCHAR || ' ' || $duckCustY::VARCHAR || ')' AS wkt,
            '{"type":"Point","coordinates":[' || $duckCustX::VARCHAR || ',' || $duckCustY::VARCHAR || ']}' AS gj
            FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""",

      "q_geo_envelope" ->
        """SELECT p_partkey,
           CAST(p_size % 10 + 1 AS DOUBLE) * CAST(p_partkey % 7 + 1 AS DOUBLE) AS area,
           2 * (CAST(p_size % 10 + 1 AS DOUBLE) + CAST(p_partkey % 7 + 1 AS DOUBLE)) AS peri,
           CAST(p_size % 10 + 1 AS DOUBLE) / 2 AS cx,
           5 AS np
           FROM part WHERE p_partkey <= 400 ORDER BY p_partkey""",

      "q_geo_contains" ->
        s"""SELECT count(*) AS n FROM customer
            WHERE $duckCustX > 10.0 AND $duckCustX < 80.0 AND $duckCustY > 10.0 AND $duckCustY < 80.0""",

      "q_geo_intersects" ->
        """SELECT o_orderkey,
           (CAST(o_orderkey % 50 AS DOUBLE) <= CAST(o_orderkey % 40 + 15 AS DOUBLE)
            AND CAST(o_orderkey % 50 + 10 AS DOUBLE) >= CAST(o_orderkey % 40 + 5 AS DOUBLE)
            AND CAST(o_orderkey % 30 AS DOUBLE) <= CAST(o_orderkey % 20 + 15 AS DOUBLE)
            AND CAST(o_orderkey % 30 + 10 AS DOUBLE) >= CAST(o_orderkey % 20 + 5 AS DOUBLE)) AS hit
           FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""",

      "q_geo_line" ->
        """SELECT s_suppkey,
           sqrt((CAST(s_suppkey % 53 AS DOUBLE) - CAST(s_suppkey % 37 AS DOUBLE)) * (CAST(s_suppkey % 53 AS DOUBLE) - CAST(s_suppkey % 37 AS DOUBLE))
              + (CAST(s_suppkey % 41 AS DOUBLE) - CAST(s_suppkey % 23 AS DOUBLE)) * (CAST(s_suppkey % 41 AS DOUBLE) - CAST(s_suppkey % 23 AS DOUBLE))) AS len,
           sqrt((CAST(s_suppkey % 53 AS DOUBLE) - CAST(s_suppkey % 37 AS DOUBLE)) * (CAST(s_suppkey % 53 AS DOUBLE) - CAST(s_suppkey % 37 AS DOUBLE))
              + (CAST(s_suppkey % 41 AS DOUBLE) - CAST(s_suppkey % 23 AS DOUBLE)) * (CAST(s_suppkey % 41 AS DOUBLE) - CAST(s_suppkey % 23 AS DOUBLE))) AS dist,
           2 AS np
           FROM supplier ORDER BY s_suppkey""",

      "q_geo_extent_agg" ->
        s"""SELECT min($duckCustX) AS xmin, min($duckCustY) AS ymin,
            max($duckCustX) AS xmax, max($duckCustY) AS ymax FROM customer""",

      "q_geo_union_agg" ->
        """SELECT CAST(count(*) * 400 AS DOUBLE) AS total_area FROM nation""",

      "q_geo_spatial_join" ->
        """SELECT n_nationkey AS zid, count(*) AS n_points
           FROM nation JOIN customer
             ON (CAST(c_custkey % 100 AS DOUBLE) + 0.5) > CAST(n_nationkey % 5 * 20 AS DOUBLE)
            AND (CAST(c_custkey % 100 AS DOUBLE) + 0.5) < CAST(n_nationkey % 5 * 20 + 20 AS DOUBLE)
            AND (CAST((c_custkey * 7) % 100 AS DOUBLE) + 0.5) > CAST(n_nationkey // 5 * 20 AS DOUBLE)
            AND (CAST((c_custkey * 7) % 100 AS DOUBLE) + 0.5) < CAST(n_nationkey // 5 * 20 + 20 AS DOUBLE)
           GROUP BY n_nationkey ORDER BY zid""",

      "q_geo_transform" ->
        """SELECT c_custkey,
           round(radians(CAST(c_custkey % 360 AS DOUBLE) - 179.5) * 6378137.0, 4) AS mx,
           round(6378137.0 * ln(tan(pi() / 4 + radians(CAST(c_custkey % 160 AS DOUBLE) - 79.5) / 2)), 4) AS my
           FROM customer WHERE c_custkey <= 300 ORDER BY c_custkey""",

      "q_geo_haversine" ->
        """SELECT c_custkey,
           round(2 * 6371000.0 * asin(least(1.0, sqrt(
             sin(radians((CAST((c_custkey + 53) % 140 AS DOUBLE) - 70.0) - (CAST(c_custkey % 140 AS DOUBLE) - 70.0)) / 2)
             * sin(radians((CAST((c_custkey + 53) % 140 AS DOUBLE) - 70.0) - (CAST(c_custkey % 140 AS DOUBLE) - 70.0)) / 2)
             + cos(radians(CAST(c_custkey % 140 AS DOUBLE) - 70.0)) * cos(radians(CAST((c_custkey + 53) % 140 AS DOUBLE) - 70.0))
             * sin(radians((CAST((c_custkey + 37) % 300 AS DOUBLE) - 150.0) - (CAST(c_custkey % 300 AS DOUBLE) - 150.0)) / 2)
             * sin(radians((CAST((c_custkey + 37) % 300 AS DOUBLE) - 150.0) - (CAST(c_custkey % 300 AS DOUBLE) - 150.0)) / 2)))), 4) AS d
           FROM customer WHERE c_custkey <= 300 ORDER BY c_custkey""",

      "q_geo_ops_roundtrip" ->
        s"""SELECT c_custkey,
            'POINT (' || $duckCustX::VARCHAR || ' ' || $duckCustY::VARCHAR || ')' AS wkt_rt,
            'POINT (' || $duckCustX::VARCHAR || ' ' || $duckCustY::VARCHAR || ')' AS wkt_rt2,
            'POINT' AS gtype, false AS is_empty
            FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""",

      "q_geo_overlay" ->
        """SELECT p_partkey,
           greatest(0, least(CAST(p_size % 10 + 3 AS DOUBLE), CAST(p_partkey % 5 + 4 AS DOUBLE)) - CAST(p_partkey % 5 AS DOUBLE))
             * greatest(0, least(CAST(p_partkey % 7 + 3 AS DOUBLE), CAST(p_size % 4 + 5 AS DOUBLE)) - CAST(p_size % 4 AS DOUBLE)) AS inter_area,
           CAST(p_size % 10 + 3 AS DOUBLE) * CAST(p_partkey % 7 + 3 AS DOUBLE) + 4.0 * 5.0
             - greatest(0, least(CAST(p_size % 10 + 3 AS DOUBLE), CAST(p_partkey % 5 + 4 AS DOUBLE)) - CAST(p_partkey % 5 AS DOUBLE))
             * greatest(0, least(CAST(p_partkey % 7 + 3 AS DOUBLE), CAST(p_size % 4 + 5 AS DOUBLE)) - CAST(p_size % 4 AS DOUBLE)) AS union_area,
           CAST(p_size % 10 + 3 AS DOUBLE) * CAST(p_partkey % 7 + 3 AS DOUBLE)
             - greatest(0, least(CAST(p_size % 10 + 3 AS DOUBLE), CAST(p_partkey % 5 + 4 AS DOUBLE)) - CAST(p_partkey % 5 AS DOUBLE))
             * greatest(0, least(CAST(p_partkey % 7 + 3 AS DOUBLE), CAST(p_size % 4 + 5 AS DOUBLE)) - CAST(p_size % 4 AS DOUBLE)) AS diff_area
           FROM part WHERE p_partkey <= 300 ORDER BY p_partkey""",

      "q_geo_convexhull" ->
        """SELECT s_suppkey,
           CAST(s_suppkey % 10 + 1 AS DOUBLE) * CAST(s_suppkey % 8 + 1 AS DOUBLE) / 2 AS hull_area,
           4 AS hull_np
           FROM supplier ORDER BY s_suppkey""",

      "q_geo_dwithin" ->
        """SELECT c_custkey,
           ((CAST(c_custkey % 20 AS DOUBLE) - CAST(c_custkey % 23 AS DOUBLE)) * (CAST(c_custkey % 20 AS DOUBLE) - CAST(c_custkey % 23 AS DOUBLE))
            + (CAST(c_custkey % 30 AS DOUBLE) - CAST(c_custkey % 17 AS DOUBLE)) * (CAST(c_custkey % 30 AS DOUBLE) - CAST(c_custkey % 17 AS DOUBLE))) <= 25.0 AS near
           FROM customer WHERE c_custkey <= 400 ORDER BY c_custkey""",

      "q_native_box" ->
        """SELECT p_partkey,
           CAST(p_size % 10 + 1 AS DOUBLE) * CAST(p_partkey % 7 + 1 AS DOUBLE) AS area,
           2 * (CAST(p_size % 10 + 1 AS DOUBLE) + CAST(p_partkey % 7 + 1 AS DOUBLE)) AS peri,
           (CAST(p_partkey % 12 AS DOUBLE) > 0 AND CAST(p_partkey % 12 AS DOUBLE) < CAST(p_size % 10 + 1 AS DOUBLE)
            AND CAST(p_partkey % 9 AS DOUBLE) > 0 AND CAST(p_partkey % 9 AS DOUBLE) < CAST(p_partkey % 7 + 1 AS DOUBLE)) AS inside
           FROM part WHERE p_partkey <= 300 ORDER BY p_partkey""",

      "q_doc_dedup_exact" ->
        """SELECT doc_id FROM (
             SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
             FROM documents) t WHERE rn = 1 ORDER BY doc_id""",

      "q_doc_tokens" ->
        """SELECT doc_id,
           length(regexp_extract_all(text, '\w+')) AS n_tokens,
           length(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_subwords,
           length(text) AS n_chars_check
           FROM documents ORDER BY doc_id""",

      "q_doc_quality" ->
        """SELECT doc_id,
           round(CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
                 / length(regexp_extract_all(text, '\w+')), 6) AS mean_word_len,
           round(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / length(text), 6) AS digit_ratio,
           round(CAST(length(list_distinct(string_split_regex(lower(text), '\s+'))) AS DOUBLE)
                 / length(string_split_regex(lower(text), '\s+')), 6) AS distinct_ratio
           FROM documents ORDER BY doc_id""",

      "q_doc_jaccard_pairs" ->
        """WITH sh AS (
             SELECT doc_id, list_distinct([array_to_string(list_slice(string_split_regex(trim(lower(text)), '\s+'), i, i + 2), ' ')
               for i in range(1, greatest(length(string_split_regex(trim(lower(text)), '\s+')) - 2, 1) + 1)]) AS s
             FROM documents)
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             round(CAST(length(list_intersect(a.s, b.s)) AS DOUBLE) / length(list_distinct(list_concat(a.s, b.s))), 6) AS jac
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           WHERE CAST(length(list_intersect(a.s, b.s)) AS DOUBLE) / length(list_distinct(list_concat(a.s, b.s))) >= 0.5
           ORDER BY id_a, id_b""",

      "q_doc_minhash_dedup" ->
        """WITH sh AS (
             SELECT doc_id, list_distinct([array_to_string(list_slice(string_split_regex(trim(lower(text)), '\s+'), i, i + 2), ' ')
               for i in range(1, greatest(length(string_split_regex(trim(lower(text)), '\s+')) - 2, 1) + 1)]) AS s
             FROM documents),
           dups AS (
             SELECT DISTINCT b.doc_id AS dup_id
             FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             WHERE CAST(length(list_intersect(a.s, b.s)) AS DOUBLE) / length(list_distinct(list_concat(a.s, b.s))) >= 0.7)
           SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT dup_id FROM dups) ORDER BY doc_id""",

      "q_emb_norm" ->
        """SELECT vec_id,
           round(sqrt(list_sum([(x::DOUBLE) * (x::DOUBLE) for x in embedding])), 6) AS l2
           FROM embeddings ORDER BY vec_id""",

      "q_emb_topk" ->
        """WITH scored AS (
             SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
               list_sum([(q.embedding[i]::DOUBLE) * (c.embedding[i]::DOUBLE) for i in range(1, length(q.embedding) + 1)])
               / (sqrt(list_sum([(x::DOUBLE) * (x::DOUBLE) for x in q.embedding]))
                  * sqrt(list_sum([(x::DOUBLE) * (x::DOUBLE) for x in c.embedding]))) AS sim
             FROM embeddings q JOIN embeddings c ON q.vec_id < 20 AND q.vec_id <> c.vec_id)
           SELECT query_id, corpus_id, round(sim, 6) AS sim, rnk FROM (
             SELECT query_id, corpus_id, sim,
               row_number() OVER (PARTITION BY query_id ORDER BY round(sim, 6) DESC, corpus_id) AS rnk
             FROM scored) t
           WHERE rnk <= 5 ORDER BY query_id, rnk"""
    )
  }
}
