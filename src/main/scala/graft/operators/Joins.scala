package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables

/** Temporal / interval join operators the build brief names as
  * flagship custom operators: the as-of join and the range join.
  *
  * The reference has no relational join at all (SURVEY §2.3) — its
  * nearest analogue is the per-key latest-state probe over the
  * in-memory store (/root/reference/model/consumer.py:170-188), which
  * answers "the most recent X for key K" for ONE key at a time. The
  * as-of join is the set-at-a-time generalization: for EVERY probe row
  * find the most recent reference row at-or-before it. The range join
  * generalizes the reference's value-threshold index probes
  * (consumer.py:178-188) from one fixed predicate to a table of
  * intervals.
  *
  * Neither is a Spark built-in. Preference order from the brief:
  * compose existing ops if semantics allow — both of these do, with
  * plans that are strictly better than the naive join formulations:
  *
  *  - As-of via union + partitioned window: ONE shuffle on the key,
  *    no join operator at all. The naive formulation
  *    (`p.join(r, k && r.ts <= p.ts) groupBy max_by`) is a range-
  *    predicate join Spark can only run as equi-join-on-key with a
  *    per-key row blowup (every probe × every earlier ref), then a
  *    re-aggregation — two shuffles and quadratic intermediate per
  *    key. The union+window form is linear per key and pins to a
  *    single Exchange (PlanSpec).
  *  - Range join via bin-explode + equi-join: the naive
  *    `e.join(bands, lo <= v && v < hi)` has no equi key, so Spark
  *    plans BroadcastNestedLoopJoin — every row tests every interval
  *    (the classic 100 TB scale-killer; with a large interval side it
  *    degrades to CartesianProduct). Exploding each interval into the
  *    fixed-width bins it overlaps and joining on the bin turns it
  *    into a hash equi-join with a residual predicate — broadcast
  *    here (tiny band table), shuffle-hash on the bin when both sides
  *    are large. Cf. the range-join binning literature (e.g.
  *    Databricks' range-join optimization; PAPERS.md).
  *
  * 100 TB posture:
  *  - as-of: one hash exchange + per-partition sort, the minimum any
  *    order-sensitive per-key operator pays; skewed keys follow the
  *    engine's standard answer (range partition by (key, ts) and
  *    stitch the per-partition last ref value across boundaries — a
  *    driver-size boundary table, same pattern as the DGIM stitch).
  *  - range: bin width trades explode factor vs residual selectivity;
  *    with intervals ~uniform in width, pick width ≈ median interval
  *    so each interval lands in O(1) bins.
  */
object Joins {

  /** Irregular value bands for the range join — deliberately NOT
    * uniform, so band lookup is a genuine interval probe rather than
    * a closed-form floor(value/width). Covers [0, 1000); events.value
    * spans ~(0, 561] across the shipped SFs. */
  private[graft] val bands: Seq[(String, Double, Double)] = Seq(
    ("micro", 0.0, 1.0),
    ("tiny", 1.0, 5.0),
    ("small", 5.0, 20.0),
    ("mid", 20.0, 75.0),
    ("large", 75.0, 150.0),
    ("xl", 150.0, 300.0),
    ("huge", 300.0, 1000.0))

  /** Bin width for the range join's interval binning. */
  private[graft] val binWidth = 25.0

  /** As-of join: for each `click` event, the user's most recent
    * `purchase` at-or-before it (value + timestamp), left-joined —
    * clicks with no prior purchase keep nulls.
    *
    * Implementation: ONE scan of events (type filter pushed to
    * parquet), rows tagged probe/ref, one partitioned window where
    * `last(..., ignoreNulls)` over rows-unbounded-preceding carries
    * the latest ref value forward onto every probe row. Ref rows sort
    * before probe rows at equal ts (side asc) ⇒ inclusive `<=`
    * as-of semantics, matching the DuckDB `ASOF LEFT JOIN` oracle.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val tagged = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(
        col("user_id"), col("ts"),
        when(col("event_type") === "click", 1).otherwise(0).as("side"),
        col("event_id"), col("value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_ts_us",
        last(when(col("side") === 0, unix_micros(col("ts"))), ignoreNulls = true).over(w))
      .withColumn("asof_value",
        last(when(col("side") === 0, col("value")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(
        col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        round(col("value"), 4).as("click_value"),
        col("asof_ts_us"),
        round(col("asof_value"), 4).as("asof_value"))
  }

  /** Range join: classify every event's value into an irregular band
    * table (point-in-interval, NO equi key), then roll up per band.
    *
    * Each band explodes into the fixed-width bins it overlaps; the
    * probe side computes its bin in closed form; the join is then a
    * hash equi-join on the bin with the interval test as a residual.
    * Sum in exact decimal (order-independent) before the single cast
    * to double — same hygiene as q12.
    */
  def rangeJoinBands(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bandBins = bands.toDF("band", "lo", "hi")
      .withColumn("bin", explode(sequence(
        floor(col("lo") / binWidth).cast("int"),
        // hi is exclusive: the last overlapped bin is the one holding
        // the largest representable value strictly below hi
        floor((col("hi") - lit(1e-9)) / binWidth).cast("int"))))
    val e = Tables.events(spark, dir)
      .select(col("value"), floor(col("value") / binWidth).cast("int").as("bin"))
    e.join(broadcast(bandBins),
        e("bin") === bandBins("bin") &&
        e("value") >= bandBins("lo") && e("value") < bandBins("hi"))
      .groupBy(col("band"), col("lo"), col("hi"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 4).as("sum_value"))
  }
}
