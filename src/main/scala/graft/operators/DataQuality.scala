package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite — the Deequ-shaped
  * validation report a production pipeline runs on every ingest before
  * letting a batch reach the merge (the reference's ETL trusts its API
  * payload blindly; this is the guardrail a 100 TB pipeline can't skip).
  *
  * Each constraint folds to ONE report row
  * `(check, kind, observed, threshold, passed)` so the whole suite is a
  * bounded frame a scheduler can alert on. Semantics per kind:
  *
  *  - `Completeness`: observed = non-null ratio (rounded 6); passed on
  *    the UNROUNDED ratio ≥ minRatio (rounding must never flip a gate).
  *    Empty input: observed NULL, passed (vacuously) true.
  *  - `ValueRange` / `InSet`: observed = count of non-null values
  *    outside the domain; passed = 0 violations. NULLs are
  *    `Completeness`'s job — domain checks don't double-count them.
  *  - `Uniqueness`: observed = number of key groups with more than one
  *    row; passed = 0. NULL keys group like values (the SQL GROUP BY
  *    convention) — a uniqueness check on a nullable key sees one NULL
  *    group, not per-row exemptions.
  *  - `RowCountBetween`: observed = row count; passed = lo ≤ n ≤ hi.
  *  - `Referential`: observed = rows whose NON-NULL foreign key misses
  *    the reference frame (NULL fk is `Completeness`'s job); passed = 0.
  *  - `FunctionalDep`: observed = determinant groups mapping to more
  *    than one distinct dependent value; passed = 0.
  *
  * Scale shape: every ROW-LEVEL check (completeness, range, set,
  * row-count) fuses into ONE map-side-combined aggregation pass over the
  * frame regardless of how many such checks the suite carries — adding a
  * tenth range check adds a counter, not a scan. Keyed checks
  * (uniqueness, functional dependency) each need their own hash
  * aggregation on their own key — that shuffle is the check's intrinsic
  * cost — and referential is a broadcast anti-join count against the
  * (dimension-sized) reference. The report union is driver-bounded:
  * one row per check.
  */
object DataQuality {

  sealed trait Check { def check: String }

  /** Non-null ratio of `column` must be ≥ `minRatio`. */
  final case class Completeness(check: String, column: Column,
      minRatio: Double) extends Check

  /** No key group of `columns` may hold more than one row. */
  final case class Uniqueness(check: String, columns: Seq[String])
      extends Check

  /** Every non-null value of `column` must lie in [lo, hi]. */
  final case class ValueRange(check: String, column: Column, lo: Double,
      hi: Double) extends Check

  /** Every non-null value of `column` must be one of `allowed`. */
  final case class InSet(check: String, column: Column,
      allowed: Seq[String]) extends Check

  /** Total row count must lie in [lo, hi]. */
  final case class RowCountBetween(check: String, lo: Long, hi: Long)
      extends Check

  /** Every non-null `column` value must exist in `ref`'s `refColumn`. */
  final case class Referential(check: String, column: Column,
      ref: DataFrame, refColumn: Column) extends Check

  /** Each distinct `lhs` key must map to at most one NON-NULL `rhs`
    * value (NULL dependents are `Completeness`'s job). */
  final case class FunctionalDep(check: String, lhs: Seq[String],
      rhs: Column) extends Check

  private val reportCols = Seq("check", "kind", "observed", "threshold",
    "passed")

  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "validate needs at least one check")
    require(checks.map(_.check).distinct.size == checks.size,
      "check names must be unique — they key the report")

    // ---- one fused aggregation for every row-level check ----
    val rowLevel = checks.collect {
      case c: Completeness => c.check ->
        (count(c.column).as(s"__nn_${c.check}"), c)
      case c: ValueRange => c.check ->
        (sum((c.column.isNotNull &&
          (c.column.cast("double") < c.lo || c.column.cast("double") > c.hi))
          .cast("long")).as(s"__viol_${c.check}"), c)
      case c: InSet => c.check ->
        (sum((c.column.isNotNull &&
          !c.column.cast("string").isin(c.allowed: _*))
          .cast("long")).as(s"__viol_${c.check}"), c)
    }
    val needsRowAgg =
      rowLevel.nonEmpty || checks.exists(_.isInstanceOf[RowCountBetween])
    val rowAgg = if (needsRowAgg) {
      val aggs = count(lit(1)).as("__n") +: rowLevel.map(_._2._1)
      Some(df.agg(aggs.head, aggs.tail: _*))
    } else None

    val branches: Seq[DataFrame] = checks.map {
      case c: Completeness =>
        val ratio = col(s"__nn_${c.check}").cast("double") /
          col("__n").cast("double")
        rowAgg.get.select(lit(c.check).as("check"),
          lit("completeness").as("kind"),
          when(col("__n") > 0, round(ratio, 6)).as("observed"),
          lit(c.minRatio).as("threshold"),
          (col("__n") === 0 || ratio >= c.minRatio).as("passed"))
      case c: ValueRange =>
        violationRow(rowAgg.get, c.check, "value_range",
          coalesce(col(s"__viol_${c.check}"), lit(0L)))
      case c: InSet =>
        violationRow(rowAgg.get, c.check, "in_set",
          coalesce(col(s"__viol_${c.check}"), lit(0L)))
      case c: RowCountBetween =>
        rowAgg.get.select(lit(c.check).as("check"),
          lit("row_count").as("kind"),
          col("__n").cast("double").as("observed"),
          lit(null).cast("double").as("threshold"),
          (col("__n") >= c.lo && col("__n") <= c.hi).as("passed"))
      case c: Uniqueness =>
        val dupGroups = df.groupBy(c.columns.map(col): _*)
          .agg(count(lit(1)).as("__c"))
          .agg(coalesce(sum((col("__c") > 1).cast("long")), lit(0L))
            .as("__viol"))
        violationRow(dupGroups, c.check, "uniqueness", col("__viol"))
      case c: Referential =>
        val orphans = df.select(c.column.as("__fk"))
          .filter(col("__fk").isNotNull)
          .join(broadcast(c.ref.select(c.refColumn.as("__pk")).distinct()),
            col("__fk") === col("__pk"), "left_anti")
          .agg(count(lit(1)).as("__viol"))
        violationRow(orphans, c.check, "referential", col("__viol"))
      case c: FunctionalDep =>
        val multi = df.groupBy(c.lhs.map(col): _*)
          // exact distinct over the dependent: the FD violation count is
          // a gate, not an estimate (countDistinct skips NULL dependents
          // per the scaladoc contract)
          .agg(countDistinct(c.rhs).as("__d"))
          .agg(coalesce(sum((col("__d") > 1).cast("long")), lit(0L))
            .as("__viol"))
        violationRow(multi, c.check, "functional_dep", col("__viol"))
    }

    branches.reduce(_.unionByName(_)).select(reportCols.map(col): _*)
      .orderBy(col("check"))
  }

  private def violationRow(agg1: DataFrame, check: String, kind: String,
      viol: Column): DataFrame =
    agg1.select(lit(check).as("check"), lit(kind).as("kind"),
      viol.cast("double").as("observed"),
      lit(0.0).as("threshold"),
      (viol === 0).as("passed"))
}
