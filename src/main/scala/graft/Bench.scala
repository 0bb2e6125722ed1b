package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Per-round benchmark harness. Runs every declared query against
  * `SPARK_GRAFT_SF_DIR` and emits one JSON metrics line, both to
  * stdout and to `bench_out.json` (env `SPARK_GRAFT_BENCH_OUT`), so
  * the driver never has to scrape sbt-prefixed logs.
  *
  * Honesty rules (round-1 verdict fixes):
  *  - queries are materialized with the `noop` datasource, which
  *    computes every output column (a bare `.count()` would let
  *    Catalyst prune the projection and under-measure scans);
  *  - a warmup query runs first, untimed, so the first measured
  *    query doesn't absorb JVM/codegen/parquet-footer warmup;
  *  - failures are recorded per-query (`failed` list) and flip the
  *    exit code — a broken query can no longer masquerade as a fast
  *    successful one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()

    // Warmup (untimed): touch every table family (lineitem, events,
    // documents, embeddings) so parquet footers, codegen and executor
    // threads are warm before the first timing — round-3 profiling
    // showed multi-second first-touch costs per table family.
    try materialize("q1_pricing_summary") catch { case _: Throwable => () }
    try materialize("eco_stats") catch { case _: Throwable => () }
    try materialize("llm_text_stats") catch { case _: Throwable => () }
    try materialize("llm_knn_exact") catch { case _: Throwable => () }

    // Each query is materialized twice back-to-back and the MIN is
    // recorded: the round VM throttles unpredictably under sustained
    // load (identical queries measured 10-50x apart with idle guest
    // CPU), and min-of-2 reports the engine's cost rather than the
    // host's worst spike. Both runs execute fully — a failure in
    // either marks the query failed.
    var failed = List.empty[String]
    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      def once(): Double = {
        val t0 = System.nanoTime()
        materialize(name)
        (System.nanoTime() - t0) / 1e9
      }
      val best =
        try math.min(once(), once())
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          failed ::= name
          Double.NaN
        }
      name -> (if (best.isNaN) 0.0 else best)
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1)).getOrElse("0")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":$sf,"n_queries":${results.size},"runs_per_query":2,"agg":"min","failed":$failedJson}"""
    Files.writeString(Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")), json + "\n")
    println(json)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
