package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact decimal-quantized aggregation building blocks (the repo-wide
  * "dsum" convention): quantize each value to an unscaled LONG at a fixed
  * scale, sum the longs (codegen'd long adder — a wide-decimal SUM buffer
  * is byte-array-backed in UnsafeRow and round-trips through BigDecimal
  * per update, measured ~1.7× the whole aggregate's cost), and divide
  * once, exactly, in decimal at the end.
  */
object Decimals {

  /** Unscaled-long quantization of a double column at `scale`, semantics
    * identical to `c.cast(DecimalType(18, scale)) * 10^scale` (which
    * rounds the value's SHORTEST DECIMAL REPRESENTATION half-up — Spark's
    * double→decimal cast goes through `Double.toString`).
    *
    * That cast is the expensive part: a per-row string format + BigDecimal
    * parse, measured as the dominant cost of whole aggregates (q01 at
    * sf0.1: 0.76 s → 0.28 s). The fast path here is pure codegen'd double
    * arithmetic — `floor(x·10^scale + 0.5)` — which provably equals the
    * decimal-cast result unless the scaled value sits within the combined
    * representation error of a .5 rounding boundary. Rows inside a 1e-3
    * guard band of the boundary — and rows with |scaled| ≥ 1e12, where
    * double error (2^-52·|scaled|) could approach the band itself — take
    * the exact decimal cast. Real data essentially never lands in the
    * band; the semantics stay bit-identical to the decimal path for all
    * inputs (negative half-way values included: they fall in the band and
    * so use the decimal cast's half-up-away-from-zero).
    */
  def unscaledLong(c: Column, scale: Int): Column = {
    val pow = math.pow(10, scale).toLong
    val scaled = c * lit(pow.toDouble)
    val fast = floor(scaled + lit(0.5)).cast("long")
    val exact = (c.cast(DecimalType(18, scale)) * lit(pow)).cast("long")
    when(abs(scaled - floor(scaled) - lit(0.5)) > lit(1e-3) &&
      abs(scaled) < lit(1e12), fast).otherwise(exact)
  }

  /** The one exact final division: an unscaled-long SUM back to double.
    * Runs in decimal (not double) so the quotient is exact and only the
    * final cast rounds — sums past 2^53 would otherwise double-round
    * through the long→double conversion. */
  def fromUnscaled(sumCol: Column, scale: Int): Column = {
    val pow = math.pow(10, scale).toLong
    (sumCol.cast(DecimalType(38, 0)) / lit(pow)).cast("double")
  }

  /** SUM with exact decimal quantization at `scale`, canonical double
    * output — the composition every aggregate-returning query uses.
    * Overflow bound: unscaled sums stay exact below 2^63 ≈ 9.2e18, the
    * same order as a widened decimal buffer's 1e28 — either needs a
    * two-level re-aggregation design well before 100 TB of a single
    * skewed group. */
  def dsum(c: Column, scale: Int): Column =
    fromUnscaled(sum(unscaledLong(c, scale)), scale)

  /** Exact half-up MEAN at `scale`: quantize per row ([[unscaledLong]]),
    * sum exactly, then `floor((2S + n) / 2n)` in DECIMAL(38,0) integers —
    * the half-up integer mean — and one final small-magnitude double
    * conversion. Mirrors `Profiling.profile`'s mean construction (whose
    * round-9 verdict note explains why a double SUM or a wide-decimal→
    * double division would be engine-dependent); shared here so every
    * group-mean-returning operator uses the identical arithmetic. NULL
    * for empty/all-null groups. */
  def dmean(c: Column, scale: Int): Column = {
    val dec38 = DecimalType(38, 0)
    val quantized = unscaledLong(c, scale)
    val s = sum(quantized).cast(dec38)
    // denominator counts the QUANTIZED values; a non-null input whose
    // DECIMAL(18,scale) cast overflows to null must abort loudly, not
    // silently shrink the numerator while staying in the denominator
    // (the oracle's decimal cast errors on the same row, so a silent
    // skip here would also diverge cross-engine)
    val overflowed = sum(when(c.isNotNull && quantized.isNull, 1L)
      .otherwise(0L)) > 0
    val n = count(quantized).cast(dec38)
    val a = s * lit(2) + n
    val b = n * lit(2)
    val q0 = ((a - pmod(a, b)) / b).cast(dec38)
    val q = when(overflowed, raise_error(lit(
        s"dmean: value exceeds the DECIMAL(18,$scale) quantization range " +
          s"(|v| >= 1e${18 - scale}); widen the scale or pre-clip"))
        .cast(DecimalType(38, 0)))
      .otherwise(q0)
    // Double conversion BEFORE the /10^scale: a decimal division here
    // would pick up Spark's precision-loss scale (6) and truncate
    // high-scale means to zero. The scaled mean is an exact integer —
    // double-exact below 2^53 (means at scale 12 stay exact up to
    // |mean| ≈ 9e3; scale 9 up to 9e6) — and the single IEEE division
    // that follows is what the SQL mirror runs too.
    when(n > 0, q.cast("double") / lit(math.pow(10, scale)))
  }
}
