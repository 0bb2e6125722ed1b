package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

import graft.operators.Relational

/** The split-long money accumulation (Relational.splitSum) must be a
  * pure performance substitution: bit-identical output to the
  * DECIMAL(18,2) formulation on every measure, on every layout. The
  * DuckDB oracle pins Spark↔oracle equality at sf0.01; this pins the
  * Spark-side split-long↔decimal equality including double bit
  * patterns (doubleToLongBits, not ==, so a -0.0/ulp drift cannot
  * hide), and re-checks under a different partition layout so the
  * order-independence claim is exercised, not assumed. */
class MoneySumSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def canon(rows: Array[Row]): Seq[Seq[Any]] =
    rows.map(_.toSeq.map {
      case d: Double => java.lang.Double.doubleToLongBits(d)
      case v => v
    }.toSeq).toSeq.sortBy(_.toString)

  test("q1 split-long form equals the DECIMAL form bit-for-bit") {
    val fast = canon(SparkEntry.queries("q1_pricing_summary")(spark, TestSpark.sf).collect())
    val dec = canon(Relational.q1PricingSummaryDecimal(spark, TestSpark.sf).collect())
    assert(fast == dec, "split-long money sums drifted from the decimal anchor")
  }

  test("split-long money sums are partition-layout independent (q1/q3/q5/q11)") {
    for (q <- Seq("q1_pricing_summary", "q3_revenue_by_nation",
        "q5_revenue_by_region", "q8_cube", "q11_parts_by_brand",
        "q12_priority", "q14_range_join", "eco_stats")) {
      val base = canon(SparkEntry.queries(q)(spark, TestSpark.sf).collect())
      val relaid = canon(
        SparkEntry.queries(q)(spark, TestSpark.sf).repartition(7).collect())
      // repartition after the agg only reshuffles the RESULT — instead
      // re-run with a different shuffle width to move the partial-agg
      // boundaries
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        val alt = canon(SparkEntry.queries(q)(spark, TestSpark.sf).collect())
        assert(base == alt, s"$q drifted across shuffle widths")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      assert(base == relaid, s"$q unstable under result repartition")
    }
  }
}
