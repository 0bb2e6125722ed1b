package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.Ckpt.CkptOps
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
  *    order-sensitive per-key operator pays; a SKEWED key (one key
  *    holding a partition-breaking share of the rows) takes the
  *    stitched twin `asofJoinStitched` below: chunk the key's
  *    timeline, window per chunk, stitch chunk boundaries with a
  *    broadcast carry table — same pattern as the DGIM stitch
  *    (Sketches.dgimStitchedOn).
  *  - range: bin width trades explode factor vs residual selectivity;
  *    computed from the interval table at plan-build time
  *    (`chooseBinWidth`): the median interval width keeps a typical
  *    interval in O(1) bins, clamped from below by total-width/4096
  *    so an outlier-wide interval cannot explode the broadcast table.
  */
object Joins {

  /** Irregular value bands for the range join — deliberately NOT
    * uniform, so band lookup is a genuine interval probe rather than
    * a closed-form floor(value/width). Covers [0, 1000); events.value
    * spans ~[0, 561] across the shipped SFs and TESTDATA.md records
    * the [0, 1000) domain contract — a value outside it would fall
    * out of q14 on BOTH the Spark and oracle sides, so the contract
    * is asserted by JoinsSpec's every-event-covered check. */
  private[graft] val bands: Seq[(String, Double, Double)] = Seq(
    ("micro", 0.0, 1.0),
    ("tiny", 1.0, 5.0),
    ("small", 5.0, 20.0),
    ("mid", 20.0, 75.0),
    ("large", 75.0, 150.0),
    ("xl", 150.0, 300.0),
    ("huge", 300.0, 1000.0))

  /** Bin width for a given interval table, computed driver-side at
    * plan-build time (the table is tiny by contract — it broadcasts).
    * Median interval width ⇒ a typical interval overlaps O(1) bins;
    * the total-width/4096 clamp bounds the exploded bin table at
    * ~4096 + 2·|bands| rows even when one interval is orders of
    * magnitude wider than the median (each interval costs
    * ceil(width/binWidth)+1 ≤ width/binWidth + 2 bins, and
    * Σ width/binWidth ≤ 4096 under the clamp), so the broadcast
    * stays kilobytes no matter how skewed the interval widths are. */
  private[graft] def chooseBinWidth(bandTable: Seq[(String, Double, Double)]): Double = {
    require(bandTable.nonEmpty, "range join needs at least one band")
    // zero/negative-width intervals would make explodedBins' hi-side
    // floor land BELOW the lo-side floor, and Spark's sequence(start,
    // stop) then counts DOWN — emitting spurious bins. Fail at
    // plan-build instead of shipping a silently-degenerate explode.
    bandTable.foreach { case (name, lo, hi) =>
      require(hi > lo, s"band '$name' must have hi > lo (got [$lo, $hi))") }
    val widths = bandTable.map { case (_, lo, hi) => hi - lo }.sorted
    val median = widths(widths.size / 2)
    math.max(math.max(median, widths.map(identity).sum / 4096.0), 1e-9)
  }

  /** The interval table exploded into the fixed-width bins each
    * interval overlaps — the build side of the range join's hash
    * equi-join. Package-visible so JoinsSpec can pin the bounded-
    * explode property under skewed interval widths. */
  private[graft] def explodedBins(spark: SparkSession,
      bandTable: Seq[(String, Double, Double)], binWidth: Double): DataFrame = {
    import spark.implicits._
    bandTable.toDF("band", "lo", "hi")
      .withColumn("bin", explode(sequence(
        floor(col("lo") / binWidth).cast("int"),
        // hi is exclusive: the last overlapped bin is the one holding
        // the largest representable value strictly below hi
        floor((col("hi") - lit(1e-9)) / binWidth).cast("int"))))
  }

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
    * event_id is the tertiary sort key: without it, two refs sharing
    * (user_id, ts) would make the carried value a nondeterministic
    * window-tie pick (no such ties exist in the shipped testdata —
    * TESTDATA.md — but the operator must not rely on that).
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame =
    asofJoinOn(Tables.events(spark, dir))

  /** The forward direction (q17): for each click the user's NEXT
    * purchase at-or-after it — the other direction every as-of
    * implementation ships (kdb `aj` vs reverse lookup, pandas
    * `merge_asof(direction=...)`). Same single-exchange union+window
    * plan, mirrored. */
  def asofJoinForward(spark: SparkSession, dir: String): DataFrame =
    asofJoinOn(Tables.events(spark, dir), forward = true)

  /** Default staleness bound for the q18 registry form: 6 hours in
    * micros. Chosen against the shipped data so BOTH branches carry
    * weight at oracle scale (sf0.01: 222 of 1,865 matched clicks keep
    * their ref, the rest null out — TESTDATA.md). */
  val ToleranceMicros6h: Long = 6L * 3600 * 1000000

  /** The tolerance-bounded as-of join (q18): q13's match, but a ref
    * older than `tolMicros` is no match at all — pandas
    * `merge_asof(tolerance=...)` / kdb window-join semantics. Same
    * single-exchange plan; the bound is a post-carry guard, not a
    * join predicate (see `applyTolerance`). At 100 TB the tolerance
    * is what makes streaming as-of state finite: a ref older than
    * the bound can never match, so state eviction at `tolerance`
    * is exact, not approximate. */
  def asofJoinTolerance(spark: SparkSession, dir: String,
      tolMicros: Long = ToleranceMicros6h): DataFrame =
    asofJoinOn(Tables.events(spark, dir), tolerance = Some(tolMicros))

  // ---------------------------------------------------------------
  // Shared as-of machinery (round-11 verdict item 3). Every as-of
  // form — window or stitched, self-tagged events or two arbitrary
  // tables — reduces to ONE internal "tagged" frame:
  //   keys..., <tsCol>, __ts (numeric order/chunk key), __side
  //   (0 = ref, 1 = probe), __tie (ref tie-break, null on probes),
  //   probe pass-through columns (dropped/null on ref rows), and
  //   __ref (struct of the ref's ts + payload, null on probes).
  // Carrying ONE struct instead of per-column values gives row-level
  // as-of semantics (a null field in the winning ref row stays null
  // rather than falling back to an older ref's value) — exactly what
  // DuckDB's ASOF LEFT JOIN produces.
  // ---------------------------------------------------------------

  /** Numeric ordering key for a ts column: injective for timestamps
    * (unix_micros), identity for integral types — so ordering by
    * `__ts` is ordering by the column itself, and the stitched form
    * can do chunk arithmetic on it. */
  private def tsOrd(df: DataFrame, tsCol: String) = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, TimestampType}
    df.schema(tsCol).dataType match {
      case TimestampType => unix_micros(col(tsCol))
      case LongType | IntegerType | ShortType | ByteType => col(tsCol).cast("long")
      case _ => col(tsCol).cast("double")
    }
  }

  /** The tagged union of two genuinely distinct frames. Both must
    * carry `keys` and `tsCol` (same types); `payload` and `tieCol`
    * name ref columns; every other probe column passes through. */
  private def taggedFromTwo(probe: DataFrame, ref: DataFrame, keys: Seq[String],
      tsCol: String, payload: Seq[String], tieCol: Option[String]): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val passCols = probe.columns.toSeq.filterNot(c => keys.contains(c) || c == tsCol)
    val r = ref.select(keys.map(col) ++ Seq(
        col(tsCol), tsOrd(ref, tsCol).as("__ts"), lit(0).as("__side"),
        tieCol.map(col).getOrElse(lit(0L)).as("__tie")) ++
      passCols.map(c => lit(null).cast(probe.schema(c).dataType).as(c)) :+
      struct((col(tsCol) +: payload.map(col)): _*).as("__ref"): _*)
    val p = probe.select(keys.map(col) ++ Seq(
        col(tsCol), tsOrd(probe, tsCol).as("__ts"), lit(1).as("__side"),
        lit(null).cast(r.schema("__tie").dataType).as("__tie")) ++
      passCols.map(col) :+
      lit(null).cast(r.schema("__ref").dataType).as("__ref"): _*)
    r.unionByName(p)
  }

  /** The registry events form's tagged frame — ONE scan (type filter
    * pushed to parquet), rows tagged in place: the self-source
    * specialization the two-table union can't express without
    * scanning the table twice. */
  private def taggedEvents(events: DataFrame): DataFrame =
    events.filter(col("event_type").isin("click", "purchase")).select(
      col("user_id"), col("ts"),
      unix_micros(col("ts")).as("__ts"),
      when(col("event_type") === "click", 1).otherwise(0).as("__side"),
      when(col("event_type") === "purchase", col("event_id")).as("__tie"),
      col("event_id"), col("value"),
      when(col("event_type") === "purchase",
        struct(col("ts"), col("value"))).as("__ref"))

  /** Window carry core: one exchange on `keys`, no join operator.
    * Backward (`forward = false`): most recent ref at-or-before the
    * probe; equal-ts ref ties break to MAX __tie. Forward: nearest
    * ref at-or-after; ties to MIN __tie — the mirror ordering
    * (__ts desc, __tie desc) makes the same `last(ignoreNulls)` carry
    * pick the earliest qualifying ref. Inclusive at equal ts either
    * way (side asc keeps refs visible to same-ts probes). */
  private def windowCarry(tagged: DataFrame, keys: Seq[String],
      forward: Boolean): DataFrame = {
    val w = (if (forward)
        Window.partitionBy(keys.map(col): _*)
          .orderBy(col("__ts").desc, col("__side").asc, col("__tie").desc)
      else
        Window.partitionBy(keys.map(col): _*)
          .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("__carry", last(col("__ref"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
  }

  /** Tolerance guard, applied AFTER the carry (window or stitched —
    * the cores stay tolerance-blind and bit-equal): null the carried
    * ref when it is farther than `tol` ord-units from the probe
    * (micros for timestamps, raw units for numeric ts). Correct
    * because the carry is already the NEAREST qualifying ref in the
    * join direction — any other ref is farther, so nulling the
    * nearest nulls them all. A null carry passes through untouched
    * (null distance ⇒ `when` yields null). */
  private def applyTolerance(out: DataFrame, tsCol: String,
      tsType: org.apache.spark.sql.types.DataType,
      tolerance: Option[Long], forward: Boolean): DataFrame =
    tolerance.fold(out) { tol =>
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, TimestampType}
      require(tol >= 0, s"as-of tolerance must be >= 0, got $tol")
      val refOrd = tsType match {
        case TimestampType => unix_micros(col("__carry")(tsCol))
        case LongType | IntegerType | ShortType | ByteType =>
          col("__carry")(tsCol).cast("long")
        case _ => col("__carry")(tsCol).cast("double")
      }
      val dist = if (forward) refOrd - col("__ts") else col("__ts") - refOrd
      out.withColumn("__carry", when(dist <= lit(tol), col("__carry")))
    }

  /** Output shape of the public two-table forms: every probe column,
    * then the matched ref's ts + payload as `asof_<name>` (null when
    * no ref qualifies). */
  private def selectAsof(out: DataFrame, probeCols: Seq[String],
      tsCol: String, payload: Seq[String]): DataFrame =
    out.select(probeCols.map(col) ++
      (tsCol +: payload).map(c => col("__carry")(c).as("asof_" + c)): _*)

  /** The general two-table as-of join (round-11 verdict item 3): for
    * each `probe` row, the `ref` row with the greatest ts at-or-before
    * it (or, `forward = true`, the least ts at-or-after it) matching
    * on `keys` — pandas `merge_asof` / kdb `aj` / DuckDB `ASOF LEFT
    * JOIN`, as one exchange + one window, no join operator (see the
    * class doc for why this beats the range-predicate join plan).
    *
    * `payload`: the ref columns to attach (emitted as
    * `asof_<tsCol>`, `asof_<payload>`, null when no ref qualifies).
    * `tieCol`: deterministic tie-break among refs sharing (keys, ts)
    * — MAX backward / MIN forward; pass None only when such ties are
    * impossible or a nondeterministic pick is acceptable.
    * `tolerance`: maximum probe→ref distance for a match (micros for
    * timestamp ts, raw units for numeric ts) — a ref beyond it yields
    * nulls, exactly pandas `merge_asof(tolerance=...)`.
    *
    * The registry events forms (q13/q15/q17) are thin wrappers over
    * the same carry cores, differing only in building their tagged
    * frame from ONE self-tagged scan instead of a two-frame union —
    * joining a table to itself through the public API would scan it
    * twice for no reason. */
  def asofJoin(probe: DataFrame, ref: DataFrame, keys: Seq[String], tsCol: String,
      payload: Seq[String], tieCol: Option[String], forward: Boolean,
      tolerance: Option[Long] = None): DataFrame =
    selectAsof(applyTolerance(
        windowCarry(taggedFromTwo(probe, ref, keys, tsCol, payload, tieCol),
          keys, forward),
        tsCol, probe.schema(tsCol).dataType, tolerance, forward),
      probe.columns.toSeq, tsCol, payload)

  /** The as-of join over an arbitrary events-shaped frame
    * (user_id, ts timestamp, event_type, event_id, value) — the
    * `dgimStitchedOn` pattern, so PropertySpec can drive the
    * window/stitched pair with adversarial generated data (duplicate
    * (user_id, ts) refs, single-key skew) that the parquet fixtures
    * never contain. Tie rule: MAX event_id backward, MIN forward
    * (see `windowCarry`). */
  private[graft] def asofJoinOn(events: DataFrame, forward: Boolean = false,
      tolerance: Option[Long] = None): DataFrame =
    finishEvents(applyTolerance(
      windowCarry(taggedEvents(events), Seq("user_id"), forward),
      "ts", org.apache.spark.sql.types.TimestampType, tolerance, forward))

  /** The registry output shape shared by q13/q15/q17: micros + round4,
    * column names matching the DuckDB oracle exactly. */
  private def finishEvents(out: DataFrame): DataFrame =
    out.select(
      col("event_id"), col("user_id"),
      col("__ts").as("ts_us"),
      round(col("value"), 4).as("click_value"),
      unix_micros(col("__carry")("ts")).as("asof_ts_us"),
      round(col("__carry")("value"), 4).as("asof_value"))

  /** The skew-proof as-of twin (round-10 verdict item 5): bit-equal
    * output to `asofJoin`, but no single key's rows ever have to fit
    * one window partition. The window form's scale limit is a key
    * whose whole history lands on one task; this form splits such a
    * key's timeline into ts-chunks and stitches the chunk boundaries:
    *
    *  1. skew census — `groupBy(key).agg(count, min ts, max ts)`,
    *     keeping only keys above `maxRowsPerKey` (≤ total/cap keys by
    *     construction, so the broadcast is bounded);
    *  2. chunk assignment — a skewed key's rows get
    *     `sub = floor((ts - lo) / w)` with w sized for ~cap rows per
    *     chunk; everyone else sub = 0. The partitioned window then
    *     runs per (key, sub): the one data exchange, now skew-free;
    *  3. boundary stitch — per (key, sub) the chunk's LAST ref
    *     (max_by over side=0 rows) forms a chunks-sized table; a tiny
    *     window over IT (partitionBy key, orderBy sub, rows up to -1,
    *     last ignoreNulls) yields each chunk's carry-in: the most
    *     recent ref from ALL earlier chunks, skipping ref-less ones.
    *     Broadcast-joined back on (key, sub);
    *  4. a probe's as-of = coalesce(chunk-local carry, carry-in) —
    *     sound because chunk ts-ranges are disjoint and ordered, so
    *     any local ref is strictly newer than every earlier-chunk ref.
    *
    * Same shape as the DGIM stitch (interior chunks exact, boundaries
    * stitched through a small ordered table). Cost: the census is a
    * second (cheap, partial-agged) scan and the stitch table a third —
    * at real scale the census comes from table stats / AQE skew
    * detection instead; this is the escape hatch for the skewed-key
    * regime, not the default path. Ordering inside a chunk matches
    * `asofJoin` exactly (ts, side, event_id), so the two forms agree
    * bit-for-bit (JoinsSpec pins equality; the q15 oracle row reuses
    * q13's DuckDB ASOF LEFT JOIN).
    */
  def asofJoinStitched(spark: SparkSession, dir: String): DataFrame =
    asofJoinStitched(spark, dir, 1L << 20)

  // explicit overload rather than a default: Scala allows defaults on
  // only ONE alternative of an overloaded method, and the general
  // two-table form below is the one that needs them (tolerance = None
  // to match asofJoin's signature)
  def asofJoinStitched(spark: SparkSession, dir: String,
      maxRowsPerKey: Long): DataFrame =
    asofJoinStitchedOn(Tables.events(spark, dir), maxRowsPerKey)

  /** See `asofJoinOn` — the stitched twin over an arbitrary frame. */
  private[graft] def asofJoinStitchedOn(events: DataFrame,
      maxRowsPerKey: Long): DataFrame =
    finishEvents(stitchedCarry(taggedEvents(events), Seq("user_id"), maxRowsPerKey))

  /** The general two-table stitched as-of join — `asofJoin`'s
    * skew-proof twin (backward direction; see `stitchedCarry` for the
    * chunk/stitch plan). Same signature minus direction, same
    * `asof_<name>` output contract, bit-equal to `asofJoin(...,
    * forward = false)` on any input. */
  def asofJoinStitched(probe: DataFrame, ref: DataFrame, keys: Seq[String],
      tsCol: String, payload: Seq[String], tieCol: Option[String],
      maxRowsPerKey: Long = 1 << 20, tolerance: Option[Long] = None): DataFrame =
    selectAsof(applyTolerance(
        stitchedCarry(taggedFromTwo(probe, ref, keys, tsCol, payload, tieCol),
          keys, maxRowsPerKey),
        tsCol, probe.schema(tsCol).dataType, tolerance, forward = false),
      probe.columns.toSeq, tsCol, payload)

  /** Stitched carry core (backward only): no single key's rows ever
    * have to fit one window partition. Steps 1–4 as documented on
    * `asofJoinStitched(spark, dir, ...)` above: bounded skew census,
    * chunk assignment via broadcast left join, the one data exchange
    * on (keys, __sub), boundary stitch through a chunks-sized
    * broadcast carry table. Ordering inside chunks matches
    * `windowCarry` exactly (__ts, __side, __tie), so the two cores
    * agree bit-for-bit. */
  private def stitchedCarry(tagged0: DataFrame, keys: Seq[String],
      maxRowsPerKey: Long): DataFrame = {
    // materialized once (r21, §8 doctrine): the tagged union feeds
    // THREE consumers — the skew census, the local-carry window path
    // and the boundary-bounds path — and each un-checkpointed
    // consumer re-ran the input scan + tagging as its own subtree
    // (3 corpus scans at 100 TB; the census note below about table
    // stats applies to the census only, not the two data paths)
    val tagged = tagged0.ckptLocal()
    val skKeys = keys.map("__sk_" + _)
    // 1. skew census: only keys ABOVE the cap survive (bounded set)
    val skew = tagged.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"), min("__ts").as("__lo"), max("__ts").as("__hi"))
      .filter(col("__n") > maxRowsPerKey)
      .select(keys.map(k => col(k).as("__sk_" + k)) ++ Seq(col("__lo"),
        // chunk width: the key's ts span split into ceil(n/cap)
        // chunks, floored at 1 unit (all-identical-ts keys collapse
        // to one chunk — no narrower split is possible or needed)
        greatest(ceil((col("__hi") - col("__lo") + 1).cast("double") /
          ceil(col("__n") / lit(maxRowsPerKey.toDouble))), lit(1.0))
          .cast("long").as("__w")): _*)
    val skCond = keys.map(k => col(k) === col("__sk_" + k)).reduce(_ && _)

    // 2. chunk ids: non-skewed keys miss the broadcast join → sub 0
    val chunked = tagged.join(broadcast(skew), skCond, "left")
      .withColumn("__sub",
        coalesce(floor((col("__ts") - col("__lo")) / col("__w")), lit(0L)))
      .drop(skKeys :+ "__lo" :+ "__w": _*)

    val w = Window.partitionBy((keys :+ "__sub").map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = chunked
      .withColumn("__loc", last(col("__ref"), ignoreNulls = true).over(w))

    // 3. the stitch table: each SKEWED key's chunks with their last
    // ref; ref-less chunks keep a null and the ignoreNulls window
    // carries past them. max_by's ordering key is null for probe
    // rows, so only refs compete — ties on ts break by __tie,
    // matching the window's (__ts, __side, __tie) order.
    val bounds = chunked
      .join(broadcast(skew.select(skKeys.map(col): _*)), skCond, "leftsemi")
      .groupBy((keys :+ "__sub").map(col): _*)
      .agg(max_by(col("__ref"),
        when(col("__side") === 0, struct(col("__ts"), col("__tie")))).as("__lastref"))
    val carryW = Window.partitionBy(keys.map(col): _*).orderBy(col("__sub").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cKeys = keys.map("__c_" + _)
    val carry = bounds
      .withColumn("__carryin", last(col("__lastref"), ignoreNulls = true).over(carryW))
      .filter(col("__carryin").isNotNull)
      .select(keys.map(k => col(k).as("__c_" + k)) ++
        Seq(col("__sub").as("__c_sub"), col("__carryin")): _*)
    val cCond = keys.map(k => col(k) === col("__c_" + k)).reduce(_ && _) &&
      col("__sub") === col("__c_sub")

    // 4. stitch: local chunk carry wins (strictly newer by chunk
    // ordering); earlier-chunk carry-in fills the chunk's pre-ref gap
    local.filter(col("__side") === 1)
      .join(broadcast(carry), cCond, "left")
      .withColumn("__carry", coalesce(col("__loc"), col("__carryin")))
      .drop(cKeys :+ "__c_sub" :+ "__carryin" :+ "__loc": _*)
  }

  /** Range join: classify every event's value into an irregular band
    * table (point-in-interval, NO equi key), then roll up per band.
    *
    * Each band explodes into the bins it overlaps (width chosen from
    * the band table itself — `chooseBinWidth`); the probe side
    * computes its bin in closed form; the join is then a hash
    * equi-join on the bin with the interval test as a residual. Sum
    * in exact decimal (order-independent) before the single cast to
    * double — same hygiene as q12.
    */
  def rangeJoin(spark: SparkSession, dir: String,
      bandTable: Seq[(String, Double, Double)]): DataFrame = {
    val binWidth = chooseBinWidth(bandTable)
    val bandBins = explodedBins(spark, bandTable, binWidth)
    val e = Tables.events(spark, dir)
      .select(col("value"), floor(col("value") / binWidth).cast("int").as("bin"),
        graft.functions.Money.moneyUnits(col("value")).as("value_c"))
    e.join(broadcast(bandBins),
        e("bin") === bandBins("bin") &&
        e("value") >= bandBins("lo") && e("value") < bandBins("hi"))
      .groupBy(col("band"), col("lo"), col("hi"))
      .agg(
        count(lit(1)).as("n_events"),
        // exact split-long accumulation, bit-equal to the decimal
        // formulation (events.value is 2-decimal-clean; MoneySumSpec)
        round(graft.functions.Money.splitSum("value_c", 100L), 4).as("sum_value"))
  }

  /** The declared q14 query: the range join over the fixed band set. */
  def rangeJoinBands(spark: SparkSession, dir: String): DataFrame =
    rangeJoin(spark, dir, bands)

  /** Interval-overlap join (q16): completes the temporal-join family
    * — the as-of join matches a point against a point history, the
    * range join a point against intervals; this joins INTERVALS to
    * INTERVALS. Concretely: gap-based user sessions
    * (Ecosystem.sessions) against a derived audit-window grid (one
    * 90-minute window every 6 hours across the corpus timespan,
    * anchored at the first event), counting overlapping sessions and
    * distinct users per window.
    *
    * Scale pattern: BOTH sides explode into fixed-width time bins
    * and hash-equi-join on the bin with the overlap test as residual
    * — the two-sided generalization of q14's binning (which bins
    * only the build side). A pair whose overlap region spans k
    * shared bins would emit k times; the FIRST-OVERLAP-BIN guard
    * (keep the pair only in the bin holding max(s_lo, w_lo)) makes
    * the join duplicate-free WITHOUT a post-join distinct — at
    * 100 TB that deletes a full-output-sized shuffle. The window
    * grid broadcasts here (a grid over any corpus timespan is tiny);
    * two genuinely large interval tables shuffle-hash on the bin
    * instead — same plan shape, same guard. The grid itself derives
    * lazily from a broadcast 1-row min/max aggregate, so no driver
    * action runs at plan-build time.
    *
    * The 600 s bin is deliberately finer than the 5 400 s window so
    * multi-bin overlap pairs occur in the shipped testdata and the
    * guard is exercised through the oracle gate (JoinsSpec pins
    * engagement: without the guard, n_sessions would overcount). */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val binSec = 600L
    val pitchSec = 21600L
    val winLenSec = 5400L
    // closed session intervals [s_lo, s_hi] in epoch seconds
    // (duration-0 sessions are points); half-open windows [w_lo, w_hi)
    val sessions = Ecosystem.sessions(spark, dir)
      .select(col("user_id"), col("session_start").as("s_lo"),
        (col("session_start") + col("duration_s")).as("s_hi"))
    val span = Tables.events(spark, dir)
      .agg(min(col("ts").cast("long")).as("t0"), max(col("ts").cast("long")).as("t1"))
    val wins = span
      .select(col("t0"), explode(sequence(lit(0L),
        floor((col("t1") - col("t0")) / pitchSec))).as("k"))
      .select(col("k"), (col("t0") + col("k") * pitchSec).as("w_lo"))
      .withColumn("w_hi", col("w_lo") + winLenSec)
    val winBins = wins.withColumn("bin",
      explode(sequence(floor(col("w_lo") / binSec),
        // w_hi exclusive: last overlapped bin holds w_hi - 1
        floor((col("w_hi") - 1) / binSec))))
    val sessBins = sessions.withColumn("bin",
      explode(sequence(floor(col("s_lo") / binSec), floor(col("s_hi") / binSec))))
    sessBins.join(broadcast(winBins),
        sessBins("bin") === winBins("bin") &&
        col("s_lo") < col("w_hi") && col("w_lo") <= col("s_hi") &&
        // first-overlap-bin guard: emit each overlapping pair exactly
        // once, in the bin where its overlap region begins
        sessBins("bin") === floor(greatest(col("s_lo"), col("w_lo")) / binSec))
      .groupBy(col("k"), col("w_lo"), col("w_hi"))
      .agg(count(lit(1)).as("n_sessions"), countDistinct(col("user_id")).as("n_users"))
  }
}
