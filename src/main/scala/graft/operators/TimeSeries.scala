package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series regularization (north-star scope): turning an irregular
  * event stream into the dense, fixed-cadence grid that downstream
  * feature pipelines and dashboards expect.
  */
object TimeSeries {

  /** Resample an event stream onto a dense per-key time grid and fill the
    * gaps: every `bucket` between a key's first and last event gets a row
    * — observed buckets carry their event count and value sum, empty
    * buckets carry a zero count and the last observed sum carried forward
    * (LOCF; null before the first observation, which cannot happen here
    * since each key's grid starts at its first event).
    *
    * Value sums are accumulated in DECIMAL(18,6) and cast back to double
    * (the repo-wide dsum convention) so the per-bucket sum is
    * order-independent and any SQL oracle reproduces it bit-exactly.
    *
    * Scale shape: the grid is generated AFTER aggregation — events
    * collapse to |key × active-bucket| rows in one hash aggregation, the
    * per-key span is a second tiny aggregation, and `sequence()` +
    * `explode` expands the grid narrowly with no shuffle (grid rows per
    * key = span/cadence, independent of event volume). The LOCF window
    * partitions by key — parallelism equals |keys|, which is the natural
    * unit here (millions of users/devices at 100 TB); a single global
    * series should use [[Relational.groupedRowNumber]]'s range-partition
    * construction instead. */
  def gapFill(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, bucketSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    denseGrid(events, keyCol, tsCol, valueCol, bucketSeconds)
      .select(col(keyCol), col("bucket"),
        coalesce(col("__n"), lit(0L)).as("n_events"),
        col("__sum").cast("double").as("bucket_sum"),
        last(col("__sum"), ignoreNulls = true).over(w).cast("double")
          .as("filled_sum"))
  }

  /** The shared grid of [[gapFill]] and [[interpolate]]: per-(key,
    * bucket) aggregates left-joined onto each key's dense bucket span
    * (`__n` and `__sum` null on empty buckets). */
  private def denseGrid(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive: $bucketSeconds")
    val bucket = timestamp_seconds(
      floor(unix_timestamp(col(tsCol)) / bucketSeconds) * bucketSeconds)
    val perBucket = events
      .select(col(keyCol), bucket.as("bucket"),
        col(valueCol).cast(DecimalType(18, 6)).as("__v"))
      .groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__sum"))
    val spans = perBucket.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
    val grid = spans.select(col(keyCol),
      explode(sequence(col("__lo"), col("__hi"),
        expr(s"INTERVAL $bucketSeconds SECONDS"))).as("bucket"))
    grid.join(perBucket, Seq(keyCol, "bucket"), "left")
  }

  /** [[gapFill]]'s linear-interpolation sibling: empty buckets get the
    * straight line between the previous and next OBSERVED bucket sums
    * (time-weighted by bucket position), not a flat carry-forward — the
    * right resampling for continuously-varying measurements (sensor
    * readings, prices) where LOCF introduces a staircase bias. Observed
    * buckets pass through exactly; the grid spans first..last observation
    * per key, so every empty bucket has both neighbors.
    *
    * The interpolated value is computed ENTIRELY in integer micro-units:
    * `round((pv·(m-k) + nv·k) / m)` with half-up integer rounding, where
    * pv/nv are the neighbor sums ×10⁶ (exact: the sums are DECIMAL(18,6))
    * and k/m are epoch-second offsets. Float interpolation lands exactly
    * on `.5` decimal boundaries whenever neighbors are one gap apart
    * (midpoints of 6-decimal values have an exact 5 in the 7th place),
    * and engines disagree on rounding those doubles — integer arithmetic
    * makes every engine produce the same micro-unit count, and /10⁶ at
    * the end is exact in double. Assumes non-negative interpolands for
    * the half-up floor-division identity (floor vs truncate agree);
    * the floor form via pmod keeps negatives consistent too.
    *
    * Scale shape: identical to [[gapFill]] — the grid is generated after
    * aggregation, and the four neighbor lookups are TWO Window operators
    * (one per frame direction, Spark fuses same-frame functions), each a
    * per-key sort of the already-collapsed grid. */
  def interpolate(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, bucketSeconds: Long): DataFrame = {
    // Both neighbor lookups run as RUNNING frames (unbounded-preceding →
    // current row): Spark's unbounded-FOLLOWING frame re-aggregates the
    // partition tail for every row — O(rows²) per key (measured 8.7 s vs
    // 0.4 s on a 105k-row grid) — so the "next observed" side instead
    // sorts DESCENDING, where the nearest following value is again a
    // running last().
    val wPrev = Window.partitionBy(col(keyCol)).orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNextRev = Window.partitionBy(col(keyCol)).orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val epoch = unix_timestamp(col("bucket"))
    val obsEpoch = when(col("__sum").isNotNull, epoch)
    val micro = (c: org.apache.spark.sql.Column) =>
      (c * lit(1000000L)).cast("long")
    val pv = micro(last(col("__sum"), ignoreNulls = true).over(wPrev))
    val pt = last(obsEpoch, ignoreNulls = true).over(wPrev)
    val nv = micro(last(col("__sum"), ignoreNulls = true).over(wNextRev))
    val nt = last(obsEpoch, ignoreNulls = true).over(wNextRev)
    val k = epoch - pt
    val m = nt - pt
    // exact half-up integer rounding of num/m: floor((2·num + m) / (2m)),
    // floor-division spelled subtract-pmod-then-divide so the decimal
    // quotient divides exactly (the skewAudit idiom)
    // num in DECIMAL(38): micro-units × span-seconds can pass 2^63 on
    // long-spanned keys, and long multiplication overflows silently
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val num = pv.cast(dec38) * (m - k) + nv.cast(dec38) * k
    val a = num * 2 + m
    val b = (m * 2).cast(dec38)
    val interpU = ((a - pmod(a, b)) / b).cast("long")
    denseGrid(events, keyCol, tsCol, valueCol, bucketSeconds)
      .select(col(keyCol), col("bucket"),
        coalesce(col("__n"), lit(0L)).as("n_events"),
        col("__sum").cast("double").as("bucket_sum"),
        (when(col("__sum").isNotNull, micro(col("__sum")))
          .otherwise(coalesce(interpU, pv, nv)).cast("double") / 1000000.0)
          .as("interp_sum"))
  }
}
