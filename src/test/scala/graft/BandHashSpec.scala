package graft

import org.apache.spark.sql.functions._


/** BandHashes must be value-identical to hash(slice(sig, b*r+1, r)) —
  * persisted LSH bucket tables (Streams.corpusBuckets) depend on the
  * band-hash values surviving the r16 banding rewrite. */
class BandHashSpec extends SparkSpec {

  test("BandHashes equals hash(slice(...)) for every band") {
    val sigs = spark.range(1000).selectExpr(
      "id",
      "transform(sequence(0, 15), k -> CAST((id * 37 + CAST(k AS BIGINT) * 1013904223) % 2147483647 AS INT)) AS s")
    val viaSql = sigs.selectExpr("id",
      "transform(sequence(0, 3), b -> hash(slice(s, b * 4 + 1, 4))) AS bh")
    val viaExpr = sigs.select(col("id"),
      org.apache.spark.sql.graft.ColumnShim.column(
        graft.functions.BandHashes(
          org.apache.spark.sql.graft.ColumnShim.expr(col("s")), 4)).as("bh"))
    val diff = viaSql.join(viaExpr.withColumnRenamed("bh", "bh2"), "id")
      .filter(col("bh") =!= col("bh2"))
    assert(diff.count() === 0)
  }

  test("bandBuckets emits the same (id, band, bh) rows as the lambda formulation") {
    val docs = spark.range(500).selectExpr("id",
      "concat('tok', id % 50, ' tok', (id*7+1) % 50, ' tok', (id*13+2) % 50, " +
      "' tok', (id*17+3) % 50, ' tok', (id*19+4) % 50) AS text")
    val sigs = docs.select(col("id").as("__id"),
      graft.operators.Dedup.minhashSignature(col("text"), 16, 3).as("__sig"))
    val nw = graft.operators.Dedup.bandBuckets(sigs, 16, 4)
    val old = sigs.select(col("__id"),
      explode(expr("transform(sequence(0, 3), b -> named_struct(" +
        "'band', b, 'bh', hash(slice(__sig, b * 4 + 1, 4))))")).as("__b"))
      .select(col("__id"), col("__b.band").as("band"), col("__b.bh").as("bh"))
    assert(nw.exceptAll(old).count() === 0)
    assert(old.exceptAll(nw).count() === 0)
  }

  test("Md5Bucket equals conv(substring(md5(...),1,8),16,10) % buckets") {
    val df = spark.range(2000).selectExpr(
      "concat('key:', CAST(id AS STRING), ' tail', CAST(id % 7 AS STRING)) AS s")
    val via = df.selectExpr("s",
      "CAST(conv(substring(md5(CAST(s AS STRING)), 1, 8), 16, 10) AS BIGINT) % 1024 AS b1",
      "CAST(conv(substring(md5(CAST(s AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100 AS c1")
      .withColumn("b2", org.apache.spark.sql.graft.ColumnShim.column(
        graft.functions.Md5Bucket(org.apache.spark.sql.graft.ColumnShim.expr(
          org.apache.spark.sql.functions.col("s")), 1024)))
      .withColumn("c2", org.apache.spark.sql.graft.ColumnShim.column(
        graft.functions.Md5Bucket(org.apache.spark.sql.graft.ColumnShim.expr(
          org.apache.spark.sql.functions.col("s")), 100)))
    assert(via.filter("b1 <> b2 OR c1 <> c2").count() === 0)
  }
}
