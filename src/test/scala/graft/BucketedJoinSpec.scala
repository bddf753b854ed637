package graft

import org.apache.spark.sql.functions._

/**
 * Bucketed fact-fact join: the cluster-scale answer to the star-join
 * shuffle. The reference keeps its fact data in its own clustered
 * storage so a key join never re-sorts; Spark's analog is a bucketed
 * table layout — write both fact tables bucketed (+sorted) by the join
 * key once, and every subsequent orderkey join runs with zero Exchange
 * on either side.
 */
class BucketedJoinSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("bucketed orderkey join: zero Exchange, same result as shuffled join") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    orders.write.mode("overwrite").option("path", s"$dir/orders_b")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b_spec")
    lineitem.write.mode("overwrite").option("path", s"$dir/lineitem_b")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_b_spec")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b_spec")
        .join(spark.table("lineitem_b_spec"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("l_extendedprice"))
      val n = joined.collect().length
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")

      val expected = orders
        .join(lineitem, col("l_orderkey") === col("o_orderkey")).count()
      assert(n.toLong == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b_spec")
      spark.sql("DROP TABLE IF EXISTS lineitem_b_spec")
    }
  }
}
