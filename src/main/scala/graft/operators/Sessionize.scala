package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands sessionization: assign a session id to every event,
  * where a new session starts when the gap to the previous event of the
  * same key exceeds `gapSeconds`.
  *
  * This is the window-function formulation of what `session_window`
  * aggregation (q39) computes as merged windows — kept separately because
  * pipelines usually need the per-EVENT session id (to join features back
  * onto raw events), which the aggregating form throws away.
  *
  * Scale shape: one hash shuffle on `key`, one per-partition sort, two
  * stacked window functions over the SAME window spec (lag + running sum)
  * — Catalyst plans them in a single Window operator, so the sort is paid
  * once. No driver materialization; state per key is O(1).
  */
object Sessionize {

  /** Adds `sessionCol` (1-based per-key session ordinal). `tieBreak`
    * disambiguates equal timestamps (pass the event id). */
  def sessionize(df: DataFrame, key: String, ts: String, gapSeconds: Long,
      sessionCol: String = "session_id", tieBreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts) +: tieBreak: _*)
    val prev = lag(col(ts), 1).over(w)
    // Exact microsecond arithmetic: a seconds cast would truncate
    // sub-second components and misclassify gaps within 1s of the bound.
    val isNew = when(
      prev.isNull ||
        unix_micros(col(ts)) - unix_micros(prev) > gapSeconds * 1000000L,
      lit(1L)).otherwise(lit(0L))
    df.withColumn(sessionCol,
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup: count, bounds, and a measure sum for each
    * (key, session). */
  def sessionStats(df: DataFrame, key: String, ts: String, gapSeconds: Long,
      measure: Column, tieBreak: Seq[Column] = Nil): DataFrame =
    sessionize(df, key, ts, gapSeconds, tieBreak = tieBreak)
      .groupBy(col(key), col("session_id"))
      .agg(count(lit(1)).as("n"),
        min(col(ts)).as("s_start"),
        max(col(ts)).as("s_last"),
        measure.as("sum_value"))
}
