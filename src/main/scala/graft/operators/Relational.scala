package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generalized relational operators (SURVEY.md §2.3/2.4/2.8). Thin,
  * built-in-backed wrappers — they exist so the engine's surface is
  * enumerable and so each carries its scale contract in one place.
  */
object Relational {

  /** Global top-k: `orderBy + limit` compiles to TakeOrderedAndProject —
    * per-partition partial top-k then a k-row driver merge; no global
    * sort, no full shuffle. The only safe global-ordering operator at
    * 100 TB. */
  def topK(df: DataFrame, k: Int, ordering: Column*): DataFrame =
    df.orderBy(ordering: _*).limit(k)

  /** Per-group top-k via window-group-limit (rn <= k pushed into the
    * sort; Spark ≥3.5 `InferWindowGroupLimit`). */
  def topKPerGroup(df: DataFrame, keys: Seq[Column], ordering: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
  }

  /** Broadcast-hint helper: dimension-side of star joins must broadcast —
    * a shuffle of the fact table on a dim key is the canonical 100 TB
    * mistake. */
  def joinBroadcastDim(fact: DataFrame, dim: DataFrame, on: Seq[String],
      how: String = "inner"): DataFrame =
    fact.join(broadcast(dim), on, how)

  /** Existence semi/anti joins — never materialize the right side's
    * payload, dedup-free by construction. */
  def semi(left: DataFrame, right: DataFrame, on: Seq[String]): DataFrame =
    left.join(right, on, "left_semi")
  def anti(left: DataFrame, right: DataFrame, on: Seq[String]): DataFrame =
    left.join(right, on, "left_anti")
}
