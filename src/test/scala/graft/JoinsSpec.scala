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
      (id, u, ts, math.rint(v * 1e4) / 1e4,
        best.map(_._4), best.map(b => math.rint(b._5 * 1e4) / 1e4))
    }.toSet

    val got = Joins.asofJoin(spark, sf).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))
    }.toSet

    assert(got == expected)
    // both populated and null-asof rows must exist, or the fixture
    // stopped exercising the LEFT semantics
    assert(got.exists(_._5.isEmpty) && got.exists(_._5.nonEmpty))
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
