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

  /** Split each document into fixed-`window`-token chunks advancing by
    * `stride` tokens (stride < window = overlapping context windows) —
    * the long-document splitting step of pretraining/RAG data prep.
    * Chunk starts are 1, 1+stride, …, through ceil((n-window)/stride)
    * strides: every token is covered, the final chunk may be short, and
    * no chunk is fully contained in its predecessor. Emits one row per
    * (document, chunk) with the chunk id, 1-based start token, actual
    * token count, and reassembled chunk text.
    *
    * Scale shape: a pure per-row explode — no shuffle at all; output
    * rows ≈ input tokens / stride. The token array is materialized once
    * per row and sliced per chunk (slice is O(window) per chunk, not
    * O(n²): each chunk copies only its own window). */
  def chunkDocuments(docs: DataFrame, textCol: String, idCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window: window=$window stride=$stride")
    import graft.functions.TextFunctions
    docs
      .withColumn("__t", TextFunctions.tokens(col(textCol)))
      .withColumn("__n", size(col("__t")).cast("long"))
      .withColumn("chunk_id", explode(sequence(lit(0L),
        floor((greatest(col("__n") - window, lit(0L)) + (stride - 1))
          / stride).cast("long"))))
      .withColumn("start_token", col("chunk_id") * stride + 1)
      .select(col(idCol), col("chunk_id"), col("start_token"),
        least(col("__n") - col("start_token") + 1, lit(window.toLong))
          .as("n_chunk_tokens"),
        array_join(slice(col("__t"), col("start_token").cast("int"), lit(window)), " ")
          .as("chunk_text"))
  }
}
