package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** M2 (SURVEY.md §2.6): the reference's staging-retention DELETE
  * (`DELETE ... WHERE CONVERT(date, TradeInDate) <> CONVERT(date,
  * GETDATE())`, rqtradein_etl.py:192) re-expressed as its relational dual:
  * a delete is a filter-retain + snapshot rewrite. On a date-partitioned
  * layout this compiles to partition pruning — dropped partitions are
  * never even read. */
object Retention {
  /** Rows surviving the retention policy (the negation of the delete
    * predicate). Compose with `Merge.writeSnapshot` to persist. */
  def retain(df: DataFrame, keep: Column): DataFrame = df.filter(keep)
}
