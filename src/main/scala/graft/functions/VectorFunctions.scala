package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math as Catalyst array expressions (north-star
  * similarity-search scope). All computation is per-row, codegen'd, in
  * IEEE double with strict left-to-right accumulation — deterministic and
  * bit-reproducible against any engine that sums in index order.
  */
object VectorFunctions {

  /** Cast to array<double> once; float inputs widen exactly. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

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
