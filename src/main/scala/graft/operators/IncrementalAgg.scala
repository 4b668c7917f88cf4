package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (T2-adjacent): keep a rolled-up
  * table current by re-aggregating stored partials with each new batch's
  * partial, instead of rescanning history. Valid for the additive
  * measures (COUNT, SUM, MIN, MAX) — which is why the partial schema
  * stores those and derives ratios (avg = sum/count) at read time; a
  * stored average cannot be merged.
  *
  * At 100 TB this is the difference between a daily job over one day's
  * data and a daily job over the whole table: the merge's input is
  * |existing groups| + |batch groups|, independent of history size.
  */
object IncrementalAgg {

  /** Partial aggregate of one batch: count + sums (+ min/max) per key. */
  def partial(batch: DataFrame, keys: Seq[String], measure: String): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(measure)).as("sum_m"),
        min(col(measure)).as("min_m"),
        max(col(measure)).as("max_m"))

  /** Merge any number of partials into one equivalent partial. Additive
    * re-aggregation: counts/sums add, min/max fold. */
  def mergePartials(parts: Seq[DataFrame], keys: Seq[String]): DataFrame =
    parts.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sum(col("sum_m")).as("sum_m"),
        min(col("min_m")).as("min_m"),
        max(col("max_m")).as("max_m"))
}
