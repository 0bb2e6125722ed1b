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

  /** Per-JVM scratch path: two engine processes (e.g. an overlapping
    * Verify and Bench) must not race on the same write directory —
    * the pid suffix gives each JVM its own copy of every sink
    * round-trip, while repeated runs inside one JVM still overwrite
    * in place. Every root is registered with a single shutdown hook
    * that deletes it recursively: without this, each JVM run (tests,
    * Verify, Bench, DevTime) would leak four sink copies of the
    * documents table into java.io.tmpdir forever. */
  private val scratchRoots = java.util.concurrent.ConcurrentHashMap.newKeySet[java.io.File]()
  private lazy val cleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      scratchRoots.forEach { root =>
        def rm(f: java.io.File): Unit = {
          val kids = f.listFiles()
          if (kids != null) kids.foreach(rm)
          f.delete(): Unit
        }
        rm(root)
      }))
  private def scratch(name: String): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"),
      s"${name}_${ProcessHandle.current().pid()}")
    cleanupHook
    scratchRoots.add(f)
    f.getAbsolutePath
  }


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
    val out = scratch("graft_partitioned_sink")
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

  /** ORC round-trip: same documents, columnar ORC instead of parquet.
    * ORC ships in Spark with the same pushdown/pruning machinery
    * (and bloom-filter/zone-map indexes at scale); the oracle checks
    * the rollup against the original table, so any round-trip loss —
    * encoding, nulls, type narrowing — breaks the hash. */
  def orcRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val out = scratch("graft_orc_sink")
    Tables.documents(spark, dir).write.mode("overwrite").orc(out)
    spark.read.orc(out)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
  }

  /** Bucketed-table round-trip: documents written `bucketBy(8,
    * doc_id)` into the session catalog, then self-joined on the
    * bucket key. Bucketing is THE co-located-join tool at 100 TB —
    * both sides of a doc_id join (or a doc_id groupBy) arrive
    * pre-partitioned on disk, so the join plans with NO exchange on
    * either side (PlanSpec pins the shuffle-free SortMergeJoin with
    * broadcast disabled). The join verifies the round-trip: every doc
    * must meet its own copy with identical text, and the rollup
    * counts survivors per source — any bucketing loss or hash drift
    * breaks the oracle. */
  def bucketedRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .write.mode("overwrite")
      .bucketBy(8, "doc_id").sortBy("doc_id")
      .option("path", scratch("graft_bucketed_sink"))
      .saveAsTable("graft_docs_bucketed")
    val t = spark.table("graft_docs_bucketed")
    bucketedSelfJoin(t)
  }

  /** The join half, exposed for the plan-shape test. The text check
    * lives INSIDE the aggregate (not a filter): a post-join equality
    * filter would get folded into the join condition, widening the
    * join keys past the bucket spec and disqualifying the bucketed
    * (exchange-free) plan. */
  private[graft] def bucketedSelfJoin(t: DataFrame): DataFrame =
    t.as("a").join(t.as("b"), col("a.doc_id") === col("b.doc_id"))
      .groupBy(col("a.source").as("source"))
      .agg(sum(when(col("a.text") === col("b.text"), lit(1L)).otherwise(lit(0L))).as("n_docs"))

  /** JSON-lines round-trip with an EXPLICIT read schema — the
    * interchange format crawl pipelines actually ingest. Schema
    * inference is deliberately avoided (at 100 TB an inference pass
    * is a full extra scan, and inferred types drift between drops);
    * the declared schema makes the read single-pass and stable. The
    * filter + rollup runs on the read-back copy, so JSON escaping of
    * the text column round-trips under the oracle's hash. */
  def jsonlRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val out = scratch("graft_jsonl_sink")
    Tables.documents(spark, dir).write.mode("overwrite").json(out)
    spark.read
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
      .json(out)
      .filter(col("n_chars") > 200 && length(col("text")) === col("n_chars"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** CSV round-trip, RFC-4180 dialect (`escape="` → quotes double
    * instead of Spark's default backslash escaping, so the files are
    * readable by DuckDB/pandas/BigQuery without dialect flags). Like
    * the JSONL leg: no header, explicit schema — inference is an
    * extra full scan and inferred CSV types drift (a numeric-looking
    * text column silently narrows). The filter proves the text column
    * itself round-trips, not just the metadata.
    *
    * Scale caveat, documented as the reason JSONL is the preferred
    * text interchange: a CSV row with embedded newlines needs
    * `multiLine=true`, which makes each file non-splittable (one task
    * per file regardless of size). This leg keeps the default
    * line-per-record read — correct for corpora whose text is
    * newline-free (or newline-escaped upstream), splittable at any
    * scale. */
  private[graft] val csvDialect = Map(
    "escape" -> "\"",
    // the CSV WRITER trims whitespace by default — silent text
    // mutation for a corpus store; both directions pinned verbatim
    "ignoreLeadingWhiteSpace" -> "false",
    "ignoreTrailingWhiteSpace" -> "false")
  def csvRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val out = scratch("graft_csv_sink")
    // headerless CSV binds read columns POSITIONALLY: pin the write
    // order to the read schema below explicitly, so a reorder of the
    // documents projection can't silently scramble fields (round-9
    // ADVICE — the JSONL leg is name-based and doesn't need this)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").options(csvDialect).csv(out)
    spark.read
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
      .options(csvDialect)
      .csv(out)
      .filter(col("n_chars") > 200 && length(col("text")) === col("n_chars"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
  }
}
