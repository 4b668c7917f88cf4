package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining batches (north-star scope): the
  * standard concat-then-chunk construction — within a shard, documents
  * are laid end to end in a deterministic order and the token stream is
  * cut into fixed-`budget` context windows; a document belongs to the
  * pack where it STARTS. Emitting (pack_id, start_offset) per document is
  * exactly the metadata a loader needs to materialize packed contexts.
  */
object Packing {

  /** Assign each document a pack id and start offset within its shard.
    *
    * Ordering within a shard is by `idCol` — deterministic and
    * replayable; pass a pre-shuffled id (hash) column for random-ish
    * mixing, which is what production corpus shuffles do anyway.
    *
    * Scale shape: one window per SHARD — parallelism equals shard count,
    * and shards are numerous by construction (one per output file /
    * worker), so the per-shard running sum never bottlenecks the way a
    * global `partitionBy()` window would. A single-shard corpus at scale
    * should instead use the [[Relational.groupedRowNumber]] pattern
    * (range partition + broadcast per-partition prefix sums) with the
    * running token sum as the rank payload. */
  def packSequences(docs: DataFrame, idCol: String, tokensCol: String,
      shardCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("start_offset", coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("start_offset") / budget))
  }
}
