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
  * recombines them exactly per GROUP. The recombined total converts
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

  /** Split-accumulated exact sum of a long units column, recombined
    * and scaled back to a double equal to the DECIMAL sum's cast. */
  def splitSum(unitsCol: String, unitsPerOne: Long): Column = {
    val total = sum(expr(s"$unitsCol DIV $SplitM")) * SplitM +
      sum(expr(s"$unitsCol % $SplitM"))
    (total.cast("decimal(38,0)") / lit(unitsPerOne).cast("decimal(10,0)"))
      .cast("double")
  }
}
