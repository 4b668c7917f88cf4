package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column
  * (north-star scope). Two paths:
  *
  *  - [[bruteForceTopK]] — exact: queries × corpus cross-join scored by
  *    cosine, per-query top-k via window-group-limit. Correctness baseline
  *    and the right plan when |queries| is small (broadcast the queries →
  *    no shuffle of the 100 TB corpus, single pass).
  *  - [[lshTopK]] — scale path: random-hyperplane LSH buckets both sides;
  *    only same-bucket pairs are scored. Recall < 1 traded for a corpus
  *    scan that shuffles on a small int key instead of cross-joining.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector. `queries` is expected to
    * be small — it is broadcast, so the corpus is never shuffled. Each
    * side's norm is computed ONCE below the join (per row, not per pair) —
    * only the codegen'd dot product runs per (query × corpus) pair. Cosine
    * is rounded to `roundTo` decimals before ranking so ordering (and any
    * external oracle) is stable; ties break on corpus id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, roundTo: Int = 6,
      excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("__qv"), norm(col(vecCol)).as("__qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("__cv"), norm(col(vecCol)).as("__cn"))
    val scored = c.join(broadcast(q),
        if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .withColumn("cosine",
        round(dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), roundTo))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"),
        col("__rn").as("rank"))
  }

  /** LSH-bucketed ANN: both sides bucketed by `planes` sign-pattern; only
    * bucket-colliding pairs are scored. With b planes the corpus fans out
    * ×1 (one bucket per vector) and the join key has 2^b values — size b
    * to executor count at scale. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, planes: Seq[Seq[Double]],
      roundTo: Int = 6): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("__qv"), norm(col(vecCol)).as("__qn"),
      hyperplaneBucket(col(vecCol), planes).as("__bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("__cv"), norm(col(vecCol)).as("__cn"),
      hyperplaneBucket(col(vecCol), planes).as("__bucket"))
    val scored = c.join(broadcast(q), Seq("__bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        round(dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), roundTo))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"),
        col("__rn").as("rank"))
  }

  /** Deterministic pseudo-random unit-ish hyperplanes from a seed (golden-
    * ratio lattice — no RNG dependency, reproducible across engines). */
  def deterministicPlanes(numPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until numPlanes).map { p =>
      (0 until dim).map { i =>
        val x = math.sin((p * dim + i + 1) * 12.9898) * 43758.5453
        2.0 * (x - math.floor(x)) - 1.0
      }
    }
}
