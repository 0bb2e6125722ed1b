package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fixed-point money accumulation: decimal-equal semantics at
  * long-arithmetic cost. The shipped money columns are
  * 2-decimal-clean (verified across SFs), so `round(c*100)` recovers
  * exact integer cents per row; summing cents as longs is associative
  * and order-independent like a DECIMAL sum — but each partial add is
  * one codegen'd primitive instead of a BigDecimal allocation
  * (Spark's decimal sum buffer is DECIMAL(28,2), above the
  * compact-long 18-digit limit, so every update round-trips through
  * java.math.BigDecimal; measured 2.3× CPU on q1 at sf1 — see
  * SURVEY §8).
  *
  * A single long sum would overflow: at 100 TB (SF~100k, ~6e11
  * lineitem rows) disc-price units of 1e-4 dollars reach ~1e9 per
  * row — wraps past 2^63 around SF~1.5k. So each value is split
  * v = (v DIV 1e6)·1e6 + (v % 1e6) and the halves summed separately:
  * |sum(v % M)| < M·N ≈ 6e17 and |sum(v DIV M)| ≤ maxUnits/M·N ≈
  * 6e14 at 100 TB — both within long with >10× headroom, and the
  * identity v = (v DIV M)·M + (v % M) (Java truncating division)
  * recombines them exactly per GROUP — in decimal(38,0) arithmetic,
  * because sum(hi)·M is the full units total and would wrap a long at
  * the same threshold the naive sum does. The recombined total converts
  * through an exact decimal division (result scale ≥ 6 holds the 2–4
  * fractional digits exactly), so the final double is bit-identical
  * to the DECIMAL(18,2) formulation the DuckDB oracle runs — pinned
  * by MoneySumSpec (doubleToLongBits equality vs the decimal form,
  * plus cross-layout sweeps). */
object Money {
  private val SplitM = 1000000L

  /** Exact integer units per row: round(c · unitsPerOne) as long.
    * unitsPerOne = 100 for cents; the rounding only strips the
    * double-representation ulp of a 2-decimal-clean value. Do NOT use
    * on columns with more than two meaningful decimals — the cast and
    * the decimal formulation could then round differently. */
  def moneyUnits(c: Column, unitsPerOne: Long = 100L): Column =
    round(c * unitsPerOne.toDouble).cast("long")

  /** moneyUnits with the 2-decimal contract enforced per row: any
    * value whose scaled form is not within 1e-6 of an integer (i.e.
    * carries a third meaningful decimal) raises a runtime error
    * instead of silently rounding. The 1e-6 tolerance covers the
    * double-representation ulp of clean values up to ~1e9 scaled
    * units — far above any per-row money amount. Use this form when
    * wiring a NEW column into the split-long path; the shipped hot
    * paths keep the unchecked form on columns already verified clean
    * (the guard costs one extra round + compare per row).
    *
    * Null-safe: a NULL input passes the guard and yields NULL, like
    * `moneyUnits` (round-14 advice — `assert_true` RAISES when its
    * condition is null, and `abs(null − round(null))` is null, so
    * the naive guard turned nullable columns into runtime errors
    * with a null message to boot). */
  def moneyUnitsChecked(c: Column, unitsPerOne: Long = 100L): Column = {
    val scaled = c * unitsPerOne.toDouble
    val guard = assert_true(
      c.isNull || abs(scaled - round(scaled)) <= lit(1e-6),
      concat(lit("moneyUnits contract: >2 meaningful decimals in "),
        coalesce(c.cast("string"), lit("null"))))
    when(guard.isNull, round(scaled)).cast("long")
  }

  /** Split-accumulated exact sum of a long units column, recombined
    * and scaled back to a double equal to the DECIMAL sum's cast.
    * The PARTIAL sums stay long (that is the whole CPU win — every
    * per-row add is a codegen'd primitive), but the per-group
    * recombination happens in decimal(38,0): `sum(hi)·M + sum(lo)`
    * in long would itself wrap past 2^63 at roughly the same scale
    * the naive sum fails (sum(hi)·M ≈ total units), defeating the
    * split. Casting each partial to decimal FIRST makes the multiply
    * and add exact at any SF — decimal(38,0) holds ~1e38, vs the
    * ~6e17 worst-case partials — and it costs one decimal op per
    * GROUP, not per row. */
  def splitSum(unitsCol: String, unitsPerOne: Long): Column = {
    val hi = sum(expr(s"$unitsCol DIV $SplitM")).cast("decimal(38,0)")
    val lo = sum(expr(s"$unitsCol % $SplitM")).cast("decimal(38,0)")
    val total = hi * lit(SplitM).cast("decimal(10,0)") + lo
    (total / lit(unitsPerOne).cast("decimal(10,0)")).cast("double")
  }
}
