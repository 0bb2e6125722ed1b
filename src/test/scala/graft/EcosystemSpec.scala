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

  test("uuid() expression (F13): v4 ids, unique per row, distributed") {
    // producer.py:15 uses uuid.uuid4 per event; the declared generator
    // deliberately substitutes md5-of-id for determinism (gen_events),
    // but the capability itself is Spark's codegen'd uuid() expression.
    import org.apache.spark.sql.functions.expr
    val ids = spark.range(1000).select(expr("uuid()").as("u"))
      .collect().map(_.getString(0))
    val v4 = "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$".r
    assert(ids.forall(u => v4.findFirstIn(u).isDefined), "must be RFC 4122 v4")
    assert(ids.distinct.length == ids.length, "uuids must be unique")
  }
}
