package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers — SURVEY.md §2.1. Every oracle-declared query must
  * produce bit-identical values in Spark and DuckDB:
  *
  *  - money doubles are cast to DECIMAL(18,2) BEFORE summing (decimal
  *    addition is exact and order-independent; IEEE double summation is
  *    not, and shuffle order differs between engines and runs);
  *  - statistical doubles are rounded to 6 dp on both sides;
  *  - averages are computed as exact decimal sum → one double division —
  *    both engines then perform the identical IEEE operation;
  *  - every ORDER BY ends in a unique-key tiebreak.
  */
object Det {
  /** Cast a money column to DECIMAL(18,2) for exact, order-independent sums. */
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Finalize an exact decimal for a DECLARED output: one correctly-rounded
    * cast to double. Declared outputs must never carry DecimalType — the
    * oracle path coerces decimals to float64 while parquet keeps exact
    * scale, so any trailing-zero value ('4434.70' vs 4434.7) hash-splits.
    * The decimal→double conversion itself is identical in both engines for
    * any unscaled value < 2^53 (exact operands, single IEEE divide).
    *
    * BOUND: beyond 2^53 unscaled (≈ scale-2 sums over ~9e11, reached by
    * per-group money sums around SF 30+) the two engines' conversions may
    * differ by 1 ulp (Spark: one BigDecimal rounding; DuckDB: hugeint→
    * double then /10^scale, two roundings). The oracle gate runs at
    * sf0.01 — 5 orders of magnitude of headroom; if a future gate scales
    * past that, switch the affected twins to round-6 of the double ratio
    * or compare at reduced precision.
    */
  def asOut(c: Column): Column = c.cast("double")

  /** Exact decimal sum of a money column, finalized to double for output.
    * Oracle twin: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE).
    */
  def moneySum(c: Column): Column = asOut(sum(money(c)))

  /** Deterministic average: exact decimal sum, then a single double
    * division, rounded to 6 dp. Same IEEE ops in Spark and DuckDB.
    * Oracle twin: round(CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*), 6)
    */
  def moneyAvg(c: Column): Column =
    round(sum(money(c)).cast("double") / count(lit(1)), 6)

  /** Exact integer CENTS of a 2-dp money double: the money() cast scaled
    * by 100, then a lossless cast to long — both engines produce the
    * identical BIGINT, so downstream products/sums stay exact.
    * Oracle twin: CAST(CAST(x AS DECIMAL(18,2)) * 100 AS BIGINT).
    */
  def cents(c: Column): Column = (money(c) * 100).cast("long")

  /** Round a statistical double to 6 dp (stddev/corr/cosine/tf-idf). */
  def r6(c: Column): Column = round(c, 6)

  /** A rate column (discount/tax: 2-dp doubles in [0,1]) as exact decimal.
    * Casting the FACTORS to decimal before multiplying keeps the product
    * exact; casting the double PRODUCT would round per-row with
    * engine-specific modes (observed: 2-cent drift vs DuckDB on sf0.001).
    */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))

  /** Exact sum of price*(1-rate), finalized to double for output.
    * Oracle twin:
    * CAST(SUM(CAST(p AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(r AS DECIMAL(4,2)))) AS DOUBLE)
    */
  def discSum(price: Column, r: Column): Column =
    asOut(sum(money(price) * (lit(1).cast(DecimalType(4, 2)) - rate(r))))
}
