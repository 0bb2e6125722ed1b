package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The IVF scale claim, demonstrated rather than asserted in a
  * comment: at 100 TB the inverted-file index is not an in-memory
  * structure — it is the corpus WRITTEN BUCKETED by coarse-cluster
  * id, so that a probe searching its `nprobe` closest lists becomes a
  * partition-pruned scan that never opens the other clusters' files.
  * This spec builds that index shape end-to-end: assign clusters with
  * the codegen'd `graft_nearest_centroid` kernel, write
  * `partitionBy("cluster")` parquet, read back with a cluster
  * predicate, and pin that Catalyst prunes at the PARTITION level
  * (a `PartitionFilters` entry — metadata-only pruning, no data files
  * of unprobed lists touched). */
class IvfIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("corpus bucketed by cluster id reads back partition-pruned (the IVF index at scale)") {
    import spark.implicits._
    val vecs = graft.sources.Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
    // deterministic toy codebook: the first 8 vectors (a real build
    // uses the Lloyd-refined centroids from Llm.annIvf — the write
    // path is identical)
    val centroids = vecs.filter(col("vec_id") < 8).orderBy(col("vec_id"))
      .select(col("v")).as[Seq[Double]].collect()
    val codebook = array(centroids.map(c =>
      array(c.map(lit).toIndexedSeq: _*)).toIndexedSeq: _*)
    val assigned = vecs.select(col("vec_id"), col("v"),
      call_function("graft_nearest_centroid", col("v"), codebook).as("cluster"))

    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_index").toString
    try {
      runPrunedReadChecks(assigned, dir)
    } finally {
      // repeated gate runs must not accumulate parquet trees in /tmp
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  private def runPrunedReadChecks(assigned: org.apache.spark.sql.DataFrame,
                                  dir: String): Unit = {
    import spark.implicits._
    assigned.write.mode("overwrite").partitionBy("cluster").parquet(dir)

    // probe two lists: the read must prune on the partition column
    val pruned = spark.read.parquet(dir).filter(col("cluster").isin(0, 3))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition pruning in:\n$plan")
    assert(plan.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("cluster")),
      s"cluster predicate not in PartitionFilters:\n$plan")
    // pruning is semantic, not just cosmetic: the pruned read returns
    // exactly the probed lists' members
    val expected = assigned.filter(col("cluster").isin(0, 3))
      .select(col("vec_id")).as[Long].collect().sorted
    val got = pruned.select(col("vec_id")).as[Long].collect().sorted
    assert(got.sameElements(expected),
      s"pruned read returned ${got.length} rows, expected ${expected.length}")
    assert(expected.nonEmpty, "probed lists must be non-empty for the test to mean anything")

    // the index layout really is one directory per inverted list
    val listDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cluster="))
    assert(listDirs.length >= 2, "bucketed write must produce per-cluster partitions")
  }

  test("nearest-centroid kernel: null inputs propagate, empty codebook fails fast") {
    // NULL codebook / NULL vector behave like any SQL function (null
    // in, null out) instead of an executor NPE
    val nullCodebook = spark.sql(
      """SELECT graft_nearest_centroid(array(CAST(1.0 AS DOUBLE)),
                 CAST(NULL AS ARRAY<ARRAY<DOUBLE>>)) AS c""").collect()(0)
    assert(nullCodebook.isNullAt(0))
    val nullVec = spark.sql(
      """SELECT graft_nearest_centroid(CAST(NULL AS ARRAY<DOUBLE>),
                 array(array(CAST(1.0 AS DOUBLE)))) AS c""").collect()(0)
    assert(nullVec.isNullAt(0))
    // an empty codebook is a caller bug: "cluster 0 of zero clusters"
    // must never come back as an answer
    val e = intercept[Throwable] {
      spark.sql(
        """SELECT graft_nearest_centroid(array(CAST(1.0 AS DOUBLE)),
                   CAST(array() AS ARRAY<ARRAY<DOUBLE>>)) AS c""").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("non-empty codebook")),
      s"expected the fail-fast message, got: $e")
  }
}
