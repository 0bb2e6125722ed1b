package graft

import org.scalatest.funsuite.AnyFunSuite

/** The registry-driven SQL surface: every declared query reachable
  * through `spark.sql` as a named temp view, answering exactly what
  * the DataFrame form answers (round-11 verdict item 8). */
class SqlSurfaceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("every registry query is served through spark.sql with row-count parity") {
    val names = SparkEntry.registerSqlSurface(spark, TestSpark.sf)
    assert(names.toSet == SparkEntry.queries.keySet, "surface must cover the whole registry")
    for (n <- names) {
      val viaSql = spark.sql(s"SELECT count(*) AS n FROM $n").head().getLong(0)
      val viaApi = SparkEntry.queries(n)(spark, TestSpark.sf).count()
      assert(viaSql == viaApi, s"SQL surface diverged on $n: $viaSql != $viaApi")
      assert(viaSql > 0, s"$n served an empty result through the SQL surface")
    }
  }

  test("includeSnapshotLegs=false registers the lazy surface only") {
    val lazyNames =
      SparkEntry.registerSqlSurface(spark, TestSpark.sf, includeSnapshotLegs = false)
    assert(lazyNames.toSet ==
      SparkEntry.queries.keySet -- SparkEntry.snapshotLegs,
      "lazy surface must exclude exactly the snapshot-semantics legs")
    assert(SparkEntry.snapshotLegs.subsetOf(SparkEntry.queries.keySet),
      "snapshotLegs must name real registry queries")
  }

  test("the SQL surface composes: user predicates apply over a registered view") {
    SparkEntry.registerSqlSurface(spark, TestSpark.sf)
    // a view is a logical plan, not a materialization: querying it
    // with a predicate + projection must answer like any subquery
    val total = spark.sql("SELECT count(*) AS n FROM eco_stats").head().getLong(0)
    val filtered = spark.sql(
      "SELECT event_type, n FROM eco_stats WHERE event_type = 'click'").collect()
    assert(filtered.length <= total && filtered.forall(_.getString(0) == "click"))
  }
}
