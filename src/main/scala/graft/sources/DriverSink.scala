package graft.sources

import org.apache.spark.sql.DataFrame

/**
 * Guard for the single-file export sinks (GeoPackage, FlatGeobuf,
 * Shapefile, FeatureCollection GeoJSON) that stream rows through the
 * driver (`toLocalIterator`) — format parity with the reference's
 * single-writer COPY TO (gdal/functions/st_write.cpp:558-569), but a
 * footgun at cluster scale: a user must not be able to accidentally
 * funnel a 100 TB table through one JVM. The guard pre-counts and
 * refuses above a configurable row limit, pointing at the
 * cluster-parallel sink for the job.
 */
object DriverSink {

  /** Default row cap for driver-funnel writers (10M ≈ single-digit-GiB
   *  exports — the realistic ceiling for the formats' consumers). */
  val DefaultMaxRows: Long = 10000000L

  private val ConfKey = "spark.graft.sink.maxDriverRows"

  /**
   * Fail fast when `df` exceeds the driver-funnel row cap. The extra
   * count() pass is deliberate: it is cheap relative to streaming the
   * same rows through one JVM, and failing BEFORE the first byte is
   * written never leaves a torn single-file export behind.
   * Set `spark.graft.sink.maxDriverRows` to raise the cap, or -1 to
   * disable the guard entirely.
   */
  def guard(df: DataFrame, format: String, parallelAlternative: String): Unit = {
    val limit = df.sparkSession.conf.get(ConfKey, DefaultMaxRows.toString).toLong
    if (limit >= 0) {
      val n = df.count()
      require(n <= limit,
        s"$format is a single-file format written through the driver; refusing to export " +
        s"$n rows (cap $limit — raise $ConfKey, or set it to -1 to disable the guard). " +
        s"For cluster-parallel output use $parallelAlternative.")
    }
  }
}
