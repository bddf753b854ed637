package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private val idx = "/tmp/graft_ivf_index_spec"

  test("persisted IVF search equals the in-flight operator and prunes partitions") {
    val cent = emb.filter($"vec_id" % 25 === 0)
    // 3 queries × nprobe 3 probe ≤ 9 of the 20 lists — pruning visible
    val qs = emb.filter($"vec_id" < 3)
    Similarity.writeIvfIndex(emb, cent,
      $"vec_id", $"embedding", $"vec_id", $"embedding", idx)

    val indexed = Similarity.ivfTopKIndexed(spark, idx, qs,
      $"vec_id", $"embedding", k = 5, nprobe = 3)
    val inflight = Similarity.ivfTopK(emb, qs, cent,
      $"vec_id", $"embedding", $"vec_id", $"embedding",
      $"vec_id", $"embedding", k = 5, nprobe = 3)

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("query_id").cast("long"), col("corpus_id").cast("long"),
        round(col("cosine"), 6), col("rank"))
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(rows(indexed) == rows(inflight), "indexed search diverged from in-flight ivfTopK")

    // partition pruning: the probed `isin` must land in PartitionFilters
    // and the scan must touch fewer list files than exist in the index
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__list"),
      s"no __list partition filter in:\n${plan.take(2000)}")
    val allLists = new java.io.File(s"$idx/lists").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("__list="))
    // inputFiles and treeString report the relation pre-pruning (the
    // metadata line truncates) — ask the scan node for its selected
    // partitions, which is what the executor actually reads
    val scans = indexed.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("/lists")) => f
    }
    assert(scans.nonEmpty, "no FileSourceScanExec over the lists relation found")
    val scanned = scans.head.selectedPartitions.partitionCount
    assert(scanned < allLists,
      s"scan reads $scanned partitions of $allLists — no pruning")
  }

  test("incremental append equals a full rebuild over the same centroids") {
    val idx2 = "/tmp/graft_ivf_index_incr"
    val idx3 = "/tmp/graft_ivf_index_full"
    Seq(idx2, idx3).foreach(d =>
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(d)))
    val cent = emb.filter($"vec_id" % 25 === 0)
    val base = emb.filter($"vec_id" % 3 =!= 0)
    val delta = emb.filter($"vec_id" % 3 === 0)
    // index-refresh path: build on base, append the arriving batch
    Similarity.writeIvfIndex(base, cent,
      $"vec_id", $"embedding", $"vec_id", $"embedding", idx2)
    Similarity.appendIvfIndex(spark, idx2, delta, $"vec_id", $"embedding")
    // the oracle: one full build over the union
    Similarity.writeIvfIndex(emb, cent,
      $"vec_id", $"embedding", $"vec_id", $"embedding", idx3)
    val qs = emb.filter($"vec_id" < 4)
    def rows(path: String) = Similarity.ivfTopKIndexed(spark, path, qs,
      $"vec_id", $"embedding", k = 5, nprobe = 3)
      .select(col("query_id").cast("long"), col("corpus_id").cast("long"),
        round(col("cosine"), 6), col("rank"))
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(rows(idx2) == rows(idx3),
      "incrementally appended index diverged from the full rebuild")
    // the appended rows landed in the same list layout (no new dirs
    // beyond the centroid set, payloads byte-exact)
    val back = spark.read.parquet(s"$idx2/lists")
      .select(col("corpus_id").as("vec_id"), col("__cv").as("embedding"))
    assert(back.exceptAll(emb.select($"vec_id", $"embedding")).count() == 0 &&
      emb.select($"vec_id", $"embedding").exceptAll(back).count() == 0)
  }

  test("index roundtrip preserves vector payloads byte-exact") {
    val back = spark.read.parquet(s"$idx/lists")
      .select(col("corpus_id").as("vec_id"), col("__cv").as("embedding"))
    val orig = emb.select($"vec_id", $"embedding")
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).count() == 0 && orig.exceptAll(back).count() == 0)
  }
}
