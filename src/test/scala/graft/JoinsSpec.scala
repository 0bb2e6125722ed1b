package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Joins

/** Semantic verification for the as-of and range joins against
  * brute-force formulations computed independently at sf0.001. The
  * operators also carry DuckDB oracles (ASOF LEFT JOIN / theta join)
  * through the correctness gate; these tests pin the semantics in-repo
  * so a refactor fails fast without the driver.
  */
class JoinsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  // Spark's round() on doubles is BigDecimal HALF_UP on the double's
  // canonical decimal form — math.rint (half-to-even on a scaled
  // float) would fail spuriously on an exact 1e-4 half-tie
  private def r4(v: Double): Double =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def collectAsof(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))
    }.toSet

  test("as-of join matches the brute-force per-probe max(ref.ts <= probe.ts)") {
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
              unix_micros(col("ts")).as("ts_us"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    val refs = e.filter(_._3 == "purchase").groupBy(_._2)
    val expected = e.filter(_._3 == "click").map { case (id, u, _, ts, v) =>
      val prior = refs.getOrElse(u, Array.empty).filter(_._4 <= ts)
      val best = if (prior.isEmpty) None else Some(prior.maxBy(_._4))
      (id, u, ts, r4(v), best.map(_._4), best.map(b => r4(b._5)))
    }.toSet

    val got = collectAsof(Joins.asofJoin(spark, sf))
    assert(got == expected)
    // both populated and null-asof rows must exist, or the fixture
    // stopped exercising the LEFT semantics
    assert(got.exists(_._5.isEmpty) && got.exists(_._5.nonEmpty))
  }

  test("stitched as-of twin is bit-equal to the window form, with chunking really engaged") {
    val want = collectAsof(Joins.asofJoin(spark, sf))
    // cap far below the per-user row counts (max ~32 at sf0.001), so
    // most keys split into several ts-chunks and the boundary stitch
    // carries refs across them — a cap that never triggers would make
    // this test vacuous
    for (cap <- Seq(4L, 8L)) {
      val got = collectAsof(Joins.asofJoinStitched(spark, sf, maxRowsPerKey = cap))
      assert(got == want, s"stitched(cap=$cap) diverged from the window form")
    }
    // and at the never-split default the twin degenerates to the
    // single-chunk window semantics unchanged
    assert(collectAsof(Joins.asofJoinStitched(spark, sf)) == want)
  }

  test("stitched as-of must cross chunk boundaries (stitch engagement probe)") {
    import org.apache.spark.sql.functions._
    // replicate the operator's own chunk assignment at cap=4 and
    // count probes whose brute-force as-of ref sits in an EARLIER
    // chunk — those are answerable ONLY through the carry table, so
    // a nonzero count proves the bit-equality test above actually
    // exercised the stitch rather than 1-chunk degenerate splits
    val cap = 4L
    val e = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        when(col("event_type") === "click", 1).otherwise(0).as("side"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val crossers = e.groupBy(_._1).values.map { rows =>
      val n = rows.length
      if (n <= cap) 0
      else {
        val lo = rows.map(_._2).min
        val hi = rows.map(_._2).max
        val w = math.max(math.ceil((hi - lo + 1).toDouble / math.ceil(n / cap.toDouble)).toLong, 1L)
        def sub(ts: Long): Long = (ts - lo) / w
        val sorted = rows.sortBy(r => (r._2, r._3))
        var lastRef = Option.empty[Long] // ts of most recent ref
        var cross = 0
        for ((_, ts, side) <- sorted) {
          if (side == 0) lastRef = Some(ts)
          else lastRef.foreach(rts => if (sub(rts) < sub(ts)) cross += 1)
        }
        cross
      }
    }.sum
    assert(crossers > 0,
      "fixture no longer makes any probe's as-of ref fall in an earlier cap-4 chunk — stitch untested")
  }

  test("window and stitched as-of agree with brute force on adversarial generated data") {
    // the parquet fixtures contain no duplicate (user_id, ts) refs
    // and no single-key skew — generate both: a giant key holding
    // ~half the rows, ts drawn from only 20 distinct seconds (heavy
    // collisions, incl. ref/ref and ref/probe ties), plus users with
    // no refs at all. The deterministic tie rule (max event_id among
    // equal-ts refs) must make window form, stitched form at tiny
    // caps, and brute force agree exactly — seeded, so failures
    // reproduce.
    import spark.implicits._
    for (seed <- Seq(11L, 22L, 33L, 44L, 55L)) {
      val rnd = new scala.util.Random(seed)
      val nUsers = 1 + rnd.nextInt(4)
      val rows = (0 until 400).map { i =>
        val user = if (rnd.nextDouble() < 0.5) 99L else 1L + rnd.nextInt(nUsers)
        val tsSec = rnd.nextInt(20).toLong
        (user, new java.sql.Timestamp(tsSec * 1000L),
          if (rnd.nextBoolean()) "click" else "purchase",
          i.toLong, rnd.nextDouble() * 100.0)
      }
      val refs = rows.filter(_._3 == "purchase").groupBy(_._1)
      val want = rows.filter(_._3 == "click").map { case (u, ts, _, id, v) =>
        val tsUs = ts.getTime * 1000L
        val prior = refs.getOrElse(u, Seq.empty).filter(_._2.getTime * 1000L <= tsUs)
        val best =
          if (prior.isEmpty) None
          else Some(prior.maxBy(r => (r._2.getTime, r._4))) // ts, then event_id
        (id, u, tsUs, r4(v), best.map(_._2.getTime * 1000L), best.map(b => r4(b._5)))
      }.toSet
      val df = rows.toDF("user_id", "ts", "event_type", "event_id", "value")
      assert(collectAsof(Joins.asofJoinOn(df)) == want, s"window form diverged, seed=$seed")
      for (cap <- Seq(3L, 7L))
        assert(collectAsof(Joins.asofJoinStitchedOn(df, cap)) == want,
          s"stitched form diverged, cap=$cap seed=$seed")
      // forward direction on the same adversarial data: nearest ref
      // at-or-after, ties to MIN event_id (the mirror rule)
      val wantFwd = rows.filter(_._3 == "click").map { case (u, t, _, id, v) =>
        val tsUs = t.getTime * 1000L
        val next = refs.getOrElse(u, Seq.empty).filter(_._2.getTime * 1000L >= tsUs)
        val best =
          if (next.isEmpty) None else Some(next.minBy(r => (r._2.getTime, r._4)))
        (id, u, tsUs, r4(v), best.map(_._2.getTime * 1000L), best.map(b => r4(b._5)))
      }.toSet
      assert(collectAsof(Joins.asofJoinOn(df, forward = true)) == wantFwd,
        s"forward form diverged, seed=$seed")
    }
  }

  test("interval-overlap join matches brute force and the bin guard really deduplicates") {
    import org.apache.spark.sql.functions._
    val (binSec, pitchSec, winLenSec) = (600L, 21600L, 5400L)
    val sess = graft.operators.Ecosystem.sessions(spark, sf)
      .select(col("user_id"), col("session_start"),
        (col("session_start") + col("duration_s")).as("s_hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val secs = graft.sources.Tables.events(spark, sf)
      .select(col("ts").cast("long")).collect().map(_.getLong(0))
    val (t0, t1) = (secs.min, secs.max)
    val wins = (0L to (t1 - t0) / pitchSec).map { k =>
      val lo = t0 + k * pitchSec; (k, lo, lo + winLenSec)
    }
    val pairs = for {
      (u, sLo, sHi) <- sess
      (k, wLo, wHi) <- wins
      if sLo < wHi && wLo <= sHi
    } yield (k, wLo, wHi, u, sLo, sHi)
    val expected = pairs.groupBy(p => (p._1, p._2, p._3)).map { case ((k, lo, hi), ps) =>
      (k, lo, hi, ps.length.toLong, ps.map(_._4).distinct.length.toLong)
    }.toSet

    val got = Joins.intervalJoin(spark, sf).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    }.toSet
    assert(got == expected)

    // engagement: some overlapping pair's overlap REGION must span a
    // bin boundary — those pairs share >= 2 bins and would double in
    // n_sessions without the first-overlap-bin guard, so brute-force
    // equality above only proves the guard if such pairs exist
    val multiBin = pairs.count { case (_, wLo, wHi, _, sLo, sHi) =>
      math.min(sHi, wHi - 1) / binSec > math.max(sLo, wLo) / binSec
    }
    assert(multiBin > 0,
      "fixture has no multi-bin overlap pair at 600 s bins — dedupe guard untested")
  }

  test("range join bin width bounds the exploded table under skewed interval widths") {
    // 100 narrow bands + one 3-orders-wider: the median alone would
    // explode the wide band into ~40k bins; the total-width/4096
    // clamp must keep the whole table near 4096 rows
    val skewed = (0 until 100).map(i => (s"n$i", i * 1.0, i * 1.0 + 0.5)) :+
      (("wide", 1000.0, 41000.0))
    val w = Joins.chooseBinWidth(skewed)
    val exploded = Joins.explodedBins(spark, skewed, w).count()
    assert(exploded <= 4096 + 2 * skewed.size,
      s"exploded $exploded rows — broadcast bound broken at width $w")
    // every interval still lands in at least one bin
    assert(exploded >= skewed.size)
    // and the uniform case stays O(1) bins per interval
    val uniform = (0 until 50).map(i => (s"u$i", i * 10.0, i * 10.0 + 10.0))
    val wu = Joins.chooseBinWidth(uniform)
    val eu = Joins.explodedBins(spark, uniform, wu).count()
    assert(eu <= 2L * uniform.size, s"uniform bands exploded $eu rows at width $wu")
  }

  test("two-table as-of join: distinct probe/ref schemas, both directions, stitched twin") {
    // the public API (round-11 verdict item 3): a probe table and a
    // reference table with their OWN schemas — page views asof-joined
    // to price updates on uid/at. Brute force is the oracle; the
    // stitched form at a tiny cap must agree exactly.
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val views = (0 until 120).map { i =>
      (i.toLong, 1L + rnd.nextInt(3),
        new java.sql.Timestamp(rnd.nextInt(30).toLong * 1000L), s"page${rnd.nextInt(5)}")
    }
    val updates = (0 until 60).map { j =>
      (1L + rnd.nextInt(4), new java.sql.Timestamp(rnd.nextInt(30).toLong * 1000L),
        rnd.nextDouble() * 10.0, 1000L + j)
    }
    val probe = views.toDF("view_id", "uid", "at", "page")
    val ref = updates.toDF("uid", "at", "price", "upd_id")
    def bf(forward: Boolean) = views.map { case (vid, uid, at, page) =>
      val cand = updates.filter(r => r._1 == uid &&
        (if (forward) r._2.getTime >= at.getTime else r._2.getTime <= at.getTime))
      val best =
        if (cand.isEmpty) None
        else if (forward) Some(cand.minBy(r => (r._2.getTime, r._4)))
        else Some(cand.maxBy(r => (r._2.getTime, r._4)))
      (vid, uid, at.getTime, page, best.map(_._2.getTime), best.map(_._3))
    }.toSet
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime, r.getString(3),
        Option(r.getTimestamp(4)).map(_.getTime),
        Option(r.get(5)).map(_.asInstanceOf[Double]))).toSet
    val keys = Seq("uid")
    assert(canon(Joins.asofJoin(probe, ref, keys, "at", Seq("price"), Some("upd_id"),
      forward = false)) == bf(false), "backward two-table as-of diverged from brute force")
    assert(canon(Joins.asofJoin(probe, ref, keys, "at", Seq("price"), Some("upd_id"),
      forward = true)) == bf(true), "forward two-table as-of diverged from brute force")
    assert(canon(Joins.asofJoinStitched(probe, ref, keys, "at", Seq("price"),
      Some("upd_id"), maxRowsPerKey = 5L, tolerance = None)) == bf(false),
      "stitched two-table as-of diverged at cap=5")
  }

  test("tolerance-bounded as-of: beyond-tolerance refs null, both directions, stitched twin") {
    // pandas merge_asof(tolerance=...) semantics through the public
    // API: a qualifying ref farther than `tol` from the probe is NO
    // match. Brute force with the distance cut is the oracle; the
    // stitched form at a tiny cap must agree; a tolerance wider than
    // the data span must reproduce the unbounded output exactly.
    import spark.implicits._
    val rnd = new scala.util.Random(11L)
    val views = (0 until 120).map { i =>
      (i.toLong, 1L + rnd.nextInt(3),
        new java.sql.Timestamp(rnd.nextInt(30).toLong * 1000L), s"page${rnd.nextInt(5)}")
    }
    val updates = (0 until 60).map { j =>
      (1L + rnd.nextInt(4), new java.sql.Timestamp(rnd.nextInt(30).toLong * 1000L),
        rnd.nextDouble() * 10.0, 1000L + j)
    }
    val probe = views.toDF("view_id", "uid", "at", "page")
    val ref = updates.toDF("uid", "at", "price", "upd_id")
    val tolMs = 5000L // 5 s of the 30 s span — both branches populated
    def bf(forward: Boolean, tolMs: Option[Long]) = views.map { case (vid, uid, at, page) =>
      val cand = updates.filter { r =>
        r._1 == uid &&
        (if (forward) r._2.getTime >= at.getTime else r._2.getTime <= at.getTime) &&
        tolMs.forall(t => math.abs(r._2.getTime - at.getTime) <= t)
      }
      val best =
        if (cand.isEmpty) None
        else if (forward) Some(cand.minBy(r => (r._2.getTime, r._4)))
        else Some(cand.maxBy(r => (r._2.getTime, r._4)))
      (vid, uid, at.getTime, page, best.map(_._2.getTime), best.map(_._3))
    }.toSet
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime, r.getString(3),
        Option(r.getTimestamp(4)).map(_.getTime),
        Option(r.get(5)).map(_.asInstanceOf[Double]))).toSet
    val keys = Seq("uid")
    val tolUs = Some(tolMs * 1000L) // timestamp ts ⇒ tolerance in micros
    val back = canon(Joins.asofJoin(probe, ref, keys, "at", Seq("price"), Some("upd_id"),
      forward = false, tolerance = tolUs))
    assert(back == bf(false, Some(tolMs)), "backward tolerance as-of diverged")
    assert(canon(Joins.asofJoin(probe, ref, keys, "at", Seq("price"), Some("upd_id"),
      forward = true, tolerance = tolUs)) == bf(true, Some(tolMs)),
      "forward tolerance as-of diverged")
    assert(canon(Joins.asofJoinStitched(probe, ref, keys, "at", Seq("price"),
      Some("upd_id"), maxRowsPerKey = 5L, tolerance = tolUs)) == bf(false, Some(tolMs)),
      "stitched tolerance as-of diverged at cap=5")
    // the guard must have BOTH kept and nulled formerly-matched rows,
    // or the fixture stopped exercising the bound
    val unbounded = bf(false, None)
    assert(back.exists(_._5.nonEmpty) && back != unbounded,
      "tolerance cut nothing — fixture no longer exercises the bound")
    // a tolerance wider than the whole span is a no-op
    assert(canon(Joins.asofJoin(probe, ref, keys, "at", Seq("price"), Some("upd_id"),
      forward = false, tolerance = Some(3600L * 1000000))) == unbounded,
      "over-wide tolerance must reproduce the unbounded as-of")
  }

  test("q18 events form: tolerance nulls exactly the stale q13 matches") {
    // the registry query is q13 with the 6 h guard — every row must
    // be q13's row with the asof fields kept iff ts_us - asof_ts_us
    // fits the bound; recomputing per row pins the wrapper wiring
    val tolUs = Joins.ToleranceMicros6h
    val base = collectAsof(Joins.asofJoin(spark, sf))
    val want = base.map { case (id, u, ts, v, rts, rv) =>
      if (rts.exists(t => ts - t <= tolUs)) (id, u, ts, v, rts, rv)
      else (id, u, ts, v, None, None)
    }
    val got = collectAsof(Joins.asofJoinTolerance(spark, sf))
    assert(got == want)
    // fixture must exercise both branches at sf0.001 (TESTDATA.md:
    // 2 of 199 matches within 1 h, 13 within 6 h)
    assert(got.exists(_._5.nonEmpty) && got != base)
  }

  test("as-of carries the winning ref ROW: a null payload field stays null") {
    // row-level semantics (what DuckDB ASOF produces): if the
    // qualifying ref row's payload field is null, the output is null
    // — NOT an older ref's non-null value. Also exercises a numeric
    // (long) ts column through the public API.
    import spark.implicits._
    val probe = Seq((1L, 5L, 100L)).toDF("uid", "at", "pid")
    val ref = Seq((1L, 1L, Option(10.0), 1L), (1L, 3L, Option.empty[Double], 2L))
      .toDF("uid", "at", "price", "rid")
    val out = Joins.asofJoin(probe, ref, Seq("uid"), "at", Seq("price"), Some("rid"),
      forward = false).collect()
    assert(out.length == 1)
    assert(out(0).getLong(3) == 3L, s"must match the at=3 ref row: ${out(0)}")
    assert(out(0).isNullAt(4),
      s"null payload in the winning ref row must stay null: ${out(0)}")
  }

  test("range join rejects zero/negative-width bands at plan-build") {
    // floor((hi-eps)/w) < floor(lo/w) on a degenerate interval makes
    // sequence() count DOWN and emit spurious bins — chooseBinWidth
    // must refuse the band table instead
    val degenerate = Seq(("ok", 0.0, 10.0), ("point", 5.0, 5.0))
    val e = intercept[IllegalArgumentException](Joins.chooseBinWidth(degenerate))
    assert(e.getMessage.contains("point"))
    val negative = Seq(("flipped", 10.0, 3.0))
    intercept[IllegalArgumentException](Joins.chooseBinWidth(negative))
  }

  test("range join matches the brute-force interval scan and covers every event") {
    import org.apache.spark.sql.functions._
    val values = graft.sources.Tables.events(spark, sf)
      .select(col("value")).collect().map(_.getDouble(0))
    val expected = Joins.bands.flatMap { case (band, lo, hi) =>
      val in = values.filter(v => v >= lo && v < hi)
      if (in.isEmpty) None
      else {
        val cents = in.map(v => BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        Some((band, lo, hi, in.length.toLong, cents.sum.toDouble))
      }
    }.toSet

    val rows = Joins.rangeJoinBands(spark, sf).collect().map { r =>
      (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3), r.getDouble(4))
    }
    assert(rows.map(_._1).distinct.length == rows.length, "a band appeared twice")
    assert(rows.toSet == expected)
    // bands partition the domain, so the join must cover every event
    // exactly once
    assert(rows.map(_._4).sum == values.length)
  }
}
