package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Single-workload bench harness for isolating session-state effects:
 * runs ONE named workload in a FRESH SparkSession and prints its
 * timing. Used to bisect cross-workload interference that the full
 * [[Bench]] run can't separate (cache blocks, codegen cache, shuffle
 * files accumulating in one long-lived session).
 */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("clustered_write")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt * 2)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.install(spark)
    import graft.GeoFunctions._

    def genPts(n: Long) = spark.range(n).select(
      st_point(pmod(hash(col("id") * 2), lit(10000000)).cast("double") / 1000.0,
        pmod(hash(col("id") * 2 + 1), lit(10000000)).cast("double") / 1000.0).as("geom"))
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    name match {
      case "clustered_write" =>
        val path = "/tmp/graft-benchone-clustered"
        graft.sources.GeoTable.writeClustered(genPts(500000L), "geom", path + "-warm",
          (0.0, 0.0, 10000.0, 10000.0), numFiles = 4)
        val trials = (1 to 3).map { _ =>
          time { graft.sources.GeoTable.writeClustered(genPts(10000000L), "geom", path,
            (0.0, 0.0, 10000.0, 10000.0), numFiles = 64) }
        }
        println(f"clustered_write_10m trials: ${trials.map(t => f"$t%.2f").mkString(", ")}")
      case "native" =>
        def nativeCount(n: Long): Long = {
          val pts = spark.range(n).select(struct(
            (pmod(hash(col("id") * 2), lit(10000000)).cast("double") / 1000.0).as("x"),
            (pmod(hash(col("id") * 2 + 1), lit(10000000)).cast("double") / 1000.0).as("y")).as("pt"))
          pts.filter(col("pt.x") > 450.0 && col("pt.x") < 650.0 &&
            col("pt.y") > 450.0 && col("pt.y") < 650.0).count()
        }
        nativeCount(1000000L)
        val trials = (1 to 3).map(_ => time { nativeCount(10000000L) })
        println(f"points_envelope_10m_native trials: ${trials.map(t => f"$t%.2f").mkString(", ")}")
      case "skew_join" =>
        // the Bench spatial_join_{uniform,hot30}_2m pair in isolation
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.5")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", (8L << 20).toString)
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", (4L << 20).toString)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        def skewPts(hot: Boolean, n: Long) = spark.range(n).select(col("id"),
          st_point(
            when(lit(hot) && col("id") % 10 < 3, lit(10.5))
              .otherwise(pmod(hash(col("id") * 2), lit(1000000)).cast("double") / 10000.0),
            when(lit(hot) && col("id") % 10 < 3, lit(10.5))
              .otherwise(pmod(hash(col("id") * 2 + 1), lit(1000000)).cast("double") / 10000.0)).as("pt"))
        val zones = spark.range(25).select(col("id").as("zid"),
          st_makeenvelope(expr("CAST(id % 5 * 20 AS DOUBLE)"), expr("CAST(id DIV 5 * 20 AS DOUBLE)"),
            expr("CAST(id % 5 * 20 + 20 AS DOUBLE)"), expr("CAST(id DIV 5 * 20 + 20 AS DOUBLE)")).as("zone"))
        import org.apache.spark.sql.execution.SparkPlan
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
        def collectAll(p: SparkPlan): Seq[SparkPlan] = {
          val below = p match {
            case q: QueryStageExec => collectAll(q.plan)
            case _ => p.children.flatMap(collectAll)
          }
          p +: below
        }
        def run(hot: Boolean, n: Long): Long = {
          val agg = graft.operators.SpatialJoin.join(skewPts(hot, n), zones,
              col("pt"), col("zone"), "st_within", cellSize = 20.0)
            .groupBy("zid").count()
          val c = agg.collect().length
          val finalPlan = agg.queryExecution.executedPlan match {
            case a: AdaptiveSparkPlanExec => a.executedPlan
            case p => p
          }
          val sk = collectAll(finalPlan).collect { case r: AQEShuffleReadExec => r }
            .flatMap(_.metrics.get("numSkewedPartitions").map(_.value)).sum
          println(s"  [skew_join hot=$hot n=$n skewedPartitions=$sk]")
          c.toLong
        }
        run(hot = false, 400000L); run(hot = true, 400000L) // warm
        Seq(false, true).foreach { hot =>
          val trials = (1 to 3).map(_ => time { run(hot, 2000000L) })
          val label = if (hot) "hot30" else "uniform"
          println(f"spatial_join_${label}_2m trials: ${trials.map(t => f"$t%.2f").mkString(", ")}")
        }
      case other => sys.error(s"unknown workload: $other")
    }
    spark.stop()
  }
}
