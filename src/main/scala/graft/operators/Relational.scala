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

  /** Skew-defeating salted equi-join (left = the skewed/fact side,
    * right = the smaller-but-not-broadcastable side). The left side's
    * hot keys are spread over `salt` buckets by a random-free
    * deterministic salt (hash of the whole row modulo `salt`); the right
    * side is replicated `salt`× via explode so every (key, salt) bucket
    * finds its match. Shuffle key becomes (key, salt) — a hot key's rows
    * land on `salt` reducers instead of one.
    *
    * AQE's skew-join handles sort-merge skew automatically when stats
    * surface it; this is the explicit form for when they don't (e.g.
    * skew behind an exchange AQE cannot split, or a deliberately
    * pre-partitioned layout). Inner joins only. */
  def saltedJoin(left: DataFrame, right: DataFrame, on: Seq[String],
      salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val lSalted = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(salt)))
    val rSalted = right.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    lSalted.join(rSalted, on :+ "__salt").drop("__salt")
  }

  /** Bucketed co-located table pair: writing both sides bucketed and
    * sorted by the join key lets every future equi-join on that key run
    * shuffle-free (bucket pruning + sort-merge without exchange) — the
    * standard layout for a 100 TB fact table joined daily on the same
    * key. Managed-table write (`saveAsTable`); read back via
    * `spark.table`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
