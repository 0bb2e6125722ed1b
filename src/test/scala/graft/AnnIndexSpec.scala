package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Llm

/** The IVFADC index's build/probe contract (the production "train
  * once, encode once, probe many" shape): `buildAnnIndex` returns
  * three plain DataFrames, so persisting the index is a parquet
  * write; a probe against the RELOADED tables must equal both the
  * in-memory probe and the registry query (`llm_ann_ivfpq`), which
  * composes the same halves. Complements IvfIndexSpec (which pins
  * the partition-pruned read of a cluster-bucketed codes table —
  * the on-disk layout `AnnIndex.codes` is written in at scale). */
class AnnIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map {
      case d: Double => java.lang.Double.doubleToLongBits(d).toString
      case x => String.valueOf(x)
    }.mkString("|")).sorted.toSeq

  test("AnnIndex parquet round-trip probes identically to the in-memory index and the registry query") {
    import spark.implicits._
    val dir = TestSpark.sf
    val all = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("nrm", expr("sqrt(aggregate(v, cast(0.0 AS double), (a, x) -> a + x * x))"))
    val probes = all.filter(col("vec_id") < 10).select(col("vec_id"), col("v"), col("nrm"))

    val built = Llm.buildAnnIndex(spark, all.select(col("vec_id"), col("v")))
    val inMem = canon(Llm.probeAnnIndex(spark, built, probes, all))

    val registry = canon(SparkEntry.queries("llm_ann_ivfpq")(spark, dir))
    assert(inMem == registry,
      "build+probe composition must equal the registry query")

    val tmp = java.nio.file.Files.createTempDirectory("graft_ann_index").toString
    try {
      built.centroids.write.mode("overwrite").parquet(s"$tmp/centroids")
      built.books.write.mode("overwrite").parquet(s"$tmp/books")
      built.codes.write.mode("overwrite").parquet(s"$tmp/codes")
      val reloaded = Llm.AnnIndex(
        spark.read.parquet(s"$tmp/centroids"),
        spark.read.parquet(s"$tmp/books"),
        spark.read.parquet(s"$tmp/codes"))
      val viaDisk = canon(Llm.probeAnnIndex(spark, reloaded, probes, all))
      assert(viaDisk == inMem,
        "a parquet-reloaded index must probe identically to the in-memory one")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }
}
