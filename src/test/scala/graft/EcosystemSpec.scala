package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ecosystem, Relational}

/** Invariant tests for the ecosystem + relational operators. */
class EcosystemSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("transition probabilities are row-stochastic per cur_event") {
    val rows = Ecosystem.transitions(spark, TestSpark.sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (cur, rs) =>
      val s = rs.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 1e-3, s"$cur: probabilities sum to $s")
    }
  }

  test("hopping windows: every event lands in exactly two windows") {
    val hop = Ecosystem.hoppingCounts(spark, TestSpark.sf).collect()
    val total = graft.sources.Tables.events(spark, TestSpark.sf).count()
    assert(hop.map(_.getLong(2)).sum == 2 * total,
      "10min/5min hop must double-count each event exactly once")
    // window starts align to the 5-minute hop grid
    assert(hop.forall(_.getLong(0) % 300 == 0), "starts must sit on the hop grid")
  }

  test("stats shares sum to 1") {
    val shares = Ecosystem.stats(spark, TestSpark.sf).collect().map(_.getDouble(4))
    assert(math.abs(shares.sum - 1.0) < 1e-3)
  }

  test("dgim-exact error counts are bounded by window totals") {
    Ecosystem.dgimExact(spark, TestSpark.sf).collect().foreach { r =>
      assert(r.getLong(1) <= r.getLong(2))
    }
  }

  test("generator is deterministic and complete") {
    val a = Ecosystem.genEvents(spark, TestSpark.sf).collect()
    val b = Ecosystem.genEvents(spark, TestSpark.sf).collect()
    assert(a.length == 1000)
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
    val types = a.map(_.getString(2)).distinct.sorted
    assert(types.sameElements(Array("click", "error", "purchase", "signup", "view")))
  }

  test("uuid() synthetic ids: RFC-4122 v4 format, unique per row (F13)") {
    // producer.py:15 uses uuid.uuid4 per event; the declared
    // generator substitutes md5-of-id for oracle determinism, and
    // genEventsUuid is the same generator with the real codegen'd
    // uuid() swapped back in
    val ids = Ecosystem.genEventsUuid(spark).select("synth_id")
      .collect().map(_.getString(0))
    assert(ids.length == 1000)
    assert(ids.distinct.length == 1000, "uuid() must be unique per row")
    val v4 = "[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}".r
    assert(ids.forall(v4.matches), s"non-v4 uuid: ${ids.find(!v4.matches(_))}")
  }

  test("json guard counts corrupt rows without dropping good ones") {
    val rows = Ecosystem.jsonGuard(spark, TestSpark.sf).collect()
    val nBad = rows.map(_.getLong(2)).sum
    val nTotal = rows.map(_.getLong(1)).sum
    assert(nBad > 0, "the deterministic corruption slice must be non-empty")
    assert(nBad < nTotal / 10, "only the event_id % 97 slice is corrupted")
  }

  test("set-ops single-pass rewrite classifies statuses") {
    val rows = Relational.q10SetOps(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => Set("except", "intersect")(r.getString(0))))
  }

  test("ts roundtrip preserves event counts") {
    val n = Ecosystem.tsRoundtrip(spark, TestSpark.sf).collect().map(_.getLong(1)).sum
    assert(n == graft.sources.Tables.events(spark, TestSpark.sf).count())
  }

  test("sessionization: 30-min gap splits, events inside the gap merge") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sessions").toString
    val base = 1700000000L * 1000000000L // epoch nanos, as events.parquet stores ts
    def ev(id: Long, user: Long, offsetSec: Long) =
      (id, base + offsetSec * 1000000000L, user, "click", 1.0, """{"k":1}""")
    // user 1: events at 0s, 600s (same session), 600+1801s (new
    // session: the gap is strictly > 1800); user 2: one lone event
    Seq(ev(1, 1, 0), ev(2, 1, 600), ev(3, 1, 2401), ev(4, 2, 50))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Ecosystem.sessions(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(out.size == 3, s"expected 3 sessions: $out")
    assert(out((1L, 1L)) == ((2L, 600L)), "first session holds both events, 600s long")
    assert(out((1L, 2L)) == ((1L, 0L)), "post-gap event opens a fresh session")
    assert(out((2L, 1L)) == ((1L, 0L)), "lone event is its own session")
  }

}
