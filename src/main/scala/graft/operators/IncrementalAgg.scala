package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** [[partial]] plus a KMV distinct sketch of `distinctCol` — COUNT
    * DISTINCT is the one common measure additive partials cannot carry
    * (distinct does not add across batches), but a bounded k-minima
    * sketch does: per batch it is k hashes per key, and re-sketching
    * stored sketches is EXACTLY the sketch of the concatenated history
    * (k smallest of a union = k smallest of the per-part k-minima). */
  def partialWithDistinct(batch: DataFrame, keys: Seq[String],
      measure: String, distinctCol: String, k: Int): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(measure)).as("sum_m"),
        min(col(measure)).as("min_m"),
        max(col(measure)).as("max_m"),
        Profiling.kminDistinct(md5(col(distinctCol).cast("string")), k)
          .as("kmin_d"))

  /** Merge [[partialWithDistinct]] partials; `estimateDistinct` reads
    * the merged sketch out as a cardinality ([[Profiling.kmvEstimate]]). */
  def mergePartialsWithDistinct(parts: Seq[DataFrame], keys: Seq[String],
      k: Int): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val kminMerge = ColumnBridge.column(
      graft.expressions.KMinDistinctMerge(
        ColumnBridge.expression(col("kmin_d")), k).toAggregateExpression())
    parts.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sum(col("sum_m")).as("sum_m"),
        min(col("min_m")).as("min_m"),
        max(col("max_m")).as("max_m"),
        kminMerge.as("kmin_d"))
  }

  def estimateDistinct(merged: DataFrame, k: Int): DataFrame =
    merged.withColumn("est_distinct",
      Profiling.kmvEstimate(col("kmin_d"), k))

  /** Incremental maintenance of an AGGREGATE-OVER-JOIN materialized
    * view (the classic delta rule for append-only facts: ΔV = γ(Δfact
    * ⋈ dim), V' = V ⊕ ΔV): only the delta batch is joined and
    * re-aggregated — the stored view is a bounded per-group partial,
    * so refresh cost is |Δfact| + |groups|, independent of fact
    * history. The join-view sibling of [[partial]]/[[mergePartials]];
    * correct for additive measures under APPEND-ONLY deltas and an
    * immutable dimension (updates/deletes need the signed-delta
    * generalization, and a dim change invalidates the view by
    * definition).
    *
    * `measure` must already be EXACT-SUMMABLE (a LONG — callers
    * quantize doubles via [[graft.functions.Decimals.unscaledLong]]):
    * a stored double partial would accumulate fold-order drift against
    * a from-scratch recompute, which is precisely the equivalence this
    * operator promises.
    *
    * Scale shape: the delta joins the dimension on its key (broadcast
    * when the dim is small, shuffle otherwise — Catalyst/AQE's call),
    * aggregates map-side to the bounded group frame, and the merge
    * unions two bounded partials. The fact table itself is never
    * rescanned. */
  def refreshJoinView(view: DataFrame, deltaFact: DataFrame,
      dim: DataFrame, factKey: String, dimKey: String,
      groupCol: String, measure: String): DataFrame = {
    val joined = deltaFact.join(dim, col(factKey) === col(dimKey))
    val deltaPartial = partial(joined, Seq(groupCol), measure)
    mergePartials(Seq(view, deltaPartial), Seq(groupCol))
  }

  /** SIGNED partial for CDC-style deltas: each row carries `sign` ∈
    * {+1, −1} (insert / retract), so a DELETE is a −1 row and an
    * UPDATE is a retract+insert pair — the signed-delta
    * generalization [[refreshJoinView]]'s scaladoc points to. Only
    * the self-inverse measures survive retraction (count as Σsign,
    * sum as Σ sign·m); MIN/MAX are fundamentally non-retractable
    * without re-scanning the group, so this partial deliberately
    * does not carry them. */
  def signedPartial(batch: DataFrame, keys: Seq[String], measure: String,
      signCol: Column): DataFrame = {
    val s = signCol.cast("long")
    batch
      .where(OpsUtil.orRaise(s.isNull || s === 1L || s === -1L,
        lit("signedPartial: sign must be +1 or -1")))
      .groupBy(keys.map(col): _*)
      .agg(sum(s).as("n"),
        sum(s * col(measure)).as("sum_m"))
  }

  /** Merge signed partials; groups whose live count reaches 0 DROP
    * (a fully-retracted group must vanish exactly as a from-scratch
    * recompute would omit it, not linger as a zero row). A group at
    * n = 0 with residual sum is a corrupted delta stream and fails
    * fast. */
  def mergeSignedPartials(parts: Seq[DataFrame],
      keys: Seq[String]): DataFrame =
    parts.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("sum_m")).as("sum_m"))
      .where(OpsUtil.orRaise(col("n") =!= 0 || col("sum_m") === 0,
        lit("mergeSignedPartials: group retracted to n=0 with nonzero " +
          "sum — unbalanced delta stream")))
      .filter(col("n") =!= 0)

  /** [[refreshJoinView]] under a signed (insert/retract) delta: the
    * delta joins the dimension, folds to a signed partial, and merges
    * into the stored view — deletes and updates maintained without a
    * fact rescan, same cost envelope as the append-only path. */
  def refreshSignedJoinView(view: DataFrame, signedDelta: DataFrame,
      dim: DataFrame, factKey: String, dimKey: String, groupCol: String,
      measure: String, signCol: Column): DataFrame = {
    val joined = signedDelta.join(dim, col(factKey) === col(dimKey))
    val deltaPartial = signedPartial(joined, Seq(groupCol), measure, signCol)
    mergeSignedPartials(Seq(view, deltaPartial), Seq(groupCol))
  }
}
