package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.expressions.DotProduct

/** Embedding-vector math (north-star similarity-search scope). The dot
  * product — the hot inner loop of similarity search — is a native
  * codegen'd Catalyst expression ([[graft.expressions.DotProduct]]); the
  * previous higher-order-function formulation fell out of whole-stage
  * codegen and allocated an intermediate array per pair. All computation
  * is per-row, IEEE double, strict index-order accumulation —
  * deterministic and bit-reproducible against any engine that sums in
  * index order.
  */
object VectorFunctions {

  /** Cast to array<double> once; float inputs widen exactly. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Codegen'd native dot product: a tight primitive loop inside the
    * enclosing whole-stage-codegen stage. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(asDouble(a)),
      ColumnBridge.expression(asDouble(b))))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** One-aggregate exact per-dimension decimal-quantized vector sum
    * (`array<long>`, NULL for never-seen dimensions) — replaces `dim`
    * separate `sum(unscaledLong(element_at(...)))` columns whose
    * ~1000-node plan tree costs more to optimize than the data costs
    * to sum (see [[graft.expressions.VectorUnscaledSum]]). */
  def vectorUnscaledSum(vec: Column, dim: Int, scale: Int): Column =
    ColumnBridge.column(graft.expressions.VectorUnscaledSum(
      ColumnBridge.expression(asDouble(vec)), dim, scale)
      .toAggregateExpression())

  /** Per-pair cosine. Callers joining queries × corpus should instead
    * precompute each side's norm *before* the join and divide the
    * per-pair [[dot]] by the product — recomputing a norm per pair is
    * quadratic waste (see [[graft.operators.Similarity]]). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane LSH bucket id: sign bits of dot products against
    * `planes` packed into an int. Deterministic planes are derived from a
    * seed by the caller; vectors in the same bucket are cosine-similar
    * candidates, turning O(n²) brute force into a bucket-local join at
    * scale. */
  def hyperplaneBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val pc = array(p.map(lit): _*)
      when(dot(v, pc) >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
}
