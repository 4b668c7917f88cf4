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
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perBucket, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("__n"), lit(0L)).as("n_events"),
        col("__sum").cast("double").as("bucket_sum"),
        last(col("__sum"), ignoreNulls = true).over(w).cast("double")
          .as("filled_sum"))
  }
}
