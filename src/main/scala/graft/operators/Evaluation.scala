package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation operators over scored rows — the metrics a training
  * pipeline computes at corpus scale AFTER a model scores billions of
  * examples (classifier quality gates, ranker comparisons). Everything
  * reduces the row-level frame to a bounded per-threshold frame first:
  * scores are pre-rounded by the caller, so the distinct-score domain is
  * small by construction and the only window in either operator runs
  * over that bounded aggregate, never over rows.
  */
object Evaluation {

  /** Exact binary AUC by the Mann-Whitney rank statistic, ties handled
    * by midranks — identical to trapezoidal ROC integration, no curve
    * discretization error. The arithmetic stays INTEGRAL until the one
    * final division: with per-score-group [min,max] rank bounds,
    * `2·Σ(pos ranks) = Σ_g pos_g·(min_g + max_g)`, so
    * `AUC = (Σ_g pos_g·(min_g+max_g) − n_pos·(n_pos+1)) / (2·n_pos·n_neg)`
    * — engine-exact, oracle-reproducible.
    *
    * Returns one row: `(n, n_pos, n_neg, n_thresholds, auc)`; `auc` is
    * NULL when a class is empty (undefined, not 0.5).
    *
    * Scale shape: one hash aggregation collapses rows to the distinct
    * score domain (bounded because callers round scores); the cumulative
    * rank walk is a window over THAT frame only, then a 1-row fold.
    * `labelCol` must be 0/1. */
  def aucBinary(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val groups = df
      .select(scoreCol.as("__s"), labelCol.cast("long").as("__y"))
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("__c"), sum(col("__y")).as("__cp"))
    val cum = groups.withColumn("__cum",
      sum(col("__c")).over(Window.orderBy(col("__s"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cum
      .select(col("__cp"), col("__c"),
        (col("__cum") - col("__c") + 1).as("__mn"), col("__cum").as("__mx"))
      .agg(sum(col("__cp") * (col("__mn") + col("__mx"))).as("__sp"),
        sum(col("__cp")).as("__np"),
        sum(col("__c") - col("__cp")).as("__nn"),
        count(lit(1)).as("n_thresholds"))
      .select((col("__np") + col("__nn")).as("n"),
        col("__np").as("n_pos"), col("__nn").as("n_neg"),
        col("n_thresholds"),
        when(col("__np") > 0 && col("__nn") > 0,
          round((col("__sp") - col("__np") * (col("__np") + lit(1)))
            .cast("double") /
            (lit(2.0) * col("__np").cast("double") * col("__nn").cast("double")),
            6)).as("auc"))
  }

  /** Precision/recall curve at every distinct score threshold
    * ("predict positive when score >= t"): per threshold, exact
    * TP/FP/FN counts and the derived precision/recall — the table a
    * quality-filter calibration reads to pick its operating point.
    *
    * Scale shape: same bounded-domain reduction as [[aucBinary]] (one
    * hash aggregation to distinct scores, one window over that frame,
    * descending cumulative sums), plus a 1-row broadcast of the total
    * positive count for recall's denominator. */
  def prCurve(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val groups = df
      .select(scoreCol.as("threshold"), labelCol.cast("long").as("__y"))
      .groupBy(col("threshold"))
      .agg(count(lit(1)).as("__c"), sum(col("__y")).as("__cp"))
    val desc = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = groups
      .withColumn("tp", sum(col("__cp")).over(desc))
      .withColumn("fp", sum(col("__c") - col("__cp")).over(desc))
    val totals = groups.agg(sum(col("__cp")).as("__tp_all"))
    cum.crossJoin(broadcast(totals))
      .select(col("threshold"), col("tp"), col("fp"),
        (col("__tp_all") - col("tp")).as("fn"),
        round(col("tp").cast("double") /
          (col("tp") + col("fp")).cast("double"), 6).as("precision"),
        when(col("__tp_all") > 0,
          round(col("tp").cast("double") / col("__tp_all").cast("double"), 6))
          .as("recall"))
  }
}
