package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-side surface: partitioned parquet layout + the
  * partition-pruned read path that justifies it. The reference's only
  * sink is an in-memory dict plus a console pretty-printer
  * (consumer.py:32-48, consultas.py:45-72); a Spark corpus pipeline's
  * equivalent "store" is a directory layout whose partition columns
  * make the common filters free.
  */
object Sinks {

  /** Round-trips `documents` through a source-partitioned parquet
    * layout and answers a two-source rollup from the written copy.
    * The point is the READ plan: filtering on the partition column
    * prunes directories at planning time — `PartitionFilters` in the
    * scan, zero I/O for the other 18 sources — which is the layout
    * decision that matters most at 100 TB (a crawl corpus partitioned
    * by source/crawl-date never scans cold sources). PlanSpec pins
    * the pruning; the oracle checks the rollup against the original
    * table, proving the round-trip is lossless for the queried slice.
    *
    * The write lands under java.io.tmpdir (per-run scratch,
    * overwritten each call — the query is re-runnable and
    * self-contained). */
  def partitionedRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val out = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_partitioned_sink").getAbsolutePath
    Tables.documents(spark, dir)
      .write.mode("overwrite").partitionBy("source").parquet(out)
    prunedRollup(spark.read.parquet(out))
  }

  /** The read half, exposed for the plan-shape test: group sizes and
    * char volume for two named sources, from a frame whose `source`
    * column is (in the round-trip) a partition directory. */
  private[graft] def prunedRollup(docs: DataFrame): DataFrame =
    docs.filter(col("source").isin("src3", "src7"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
}
