package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.functions.TextFunctions

/** BPE-style vocabulary induction over a tokenized corpus — the
  * distributed core of tokenizer training (Sennrich et al. 2016): each
  * round counts all adjacent token pairs corpus-wide, promotes the most
  * frequent pair to a new vocabulary symbol, and rewrites the corpus
  * with that pair fused. Industrial trainers run the same loop at the
  * character/byte level with incremental count deltas; this operator
  * works at whatever token granularity the corpus uses and recounts per
  * round — the O(rounds × corpus) recount is the transparent baseline,
  * with the delta-maintenance optimization noted below.
  *
  * Scale shape per round: ONE pair-count aggregation (explode of zipped
  * adjacent pairs → groupBy — map-side partial combine collapses the
  * Zipf head before the exchange), ONE driver-collected row (the top
  * pair — `limit(1)`, a TakeOrdered, not a data collect), and ONE
  * narrow map applying the merge via the codegen'd
  * [[graft.expressions.BpeMergePair]] scanner (no shuffle). The corpus
  * is `localCheckpoint`ed each round and the superseded round's blocks
  * are freed (the [[TextDedup.dupClusters]] idiom), so lineage depth and
  * iterative storage stay O(1) rounds.
  *
  * Determinism: the winning pair is (count DESC, left ASC, right ASC) —
  * a total order, so training is reproducible across partitionings.
  * Merged symbols are joined with `joiner` (default `U+0001`, chosen to
  * never collide with corpus text); pass "" to concatenate classic-BPE
  * style.
  */
object BpeTrainer {

  /** One promoted merge rule: at `round`, the adjacent pair
    * (`left`, `right`) with corpus-wide `pairCount` became `merged`. */
  case class MergeRule(round: Int, left: String, right: String,
      pairCount: Long, merged: String)

  /** The learned merge table plus the corpus rewritten with all merges
    * applied (checkpointed — safe to use without recomputing the loop).
    * Carries the `joiner` the table was trained with, so inference can
    * apply it without the caller re-stating it — a merge table trained
    * with one joiner and applied with another silently stops matching
    * after round 1 (later rules reference joiner-fused symbols the
    * mismatched inference never produces; round-8 advice finding). */
  case class Result(merges: Seq[MergeRule], corpus: DataFrame,
      joiner: String = "\u0001")

  private def applyMerge(text: Column, left: String, right: String,
      joiner: String): Column =
    ColumnBridge.column(graft.expressions.BpeMergePair(
      ColumnBridge.expression(text), left, right, joiner))

  /** Apply an already-learned merge table to a (new) corpus, in training
    * order — the inference side of [[train]]: encode held-out documents
    * with the frozen vocabulary. Each rule is one narrow codegen'd
    * scanner pass; the whole chain stays a single shuffle-free
    * projection stage. For production-size vocabularies (tens of
    * thousands of rules) chain depth makes expression trees unwieldy —
    * batch through [[applyMergesCheckpointed]] instead. */
  def applyMerges(docs: DataFrame, textCol: String, merges: Seq[MergeRule],
      joiner: String = "\u0001"): DataFrame =
    merges.sortBy(_.round).foldLeft(docs)((d, m) =>
      d.withColumn(textCol, applyMerge(col(textCol), m.left, m.right, joiner)))

  /** Apply a [[train]] result with the joiner it was trained with —
    * the mismatch-proof inference entry point (a table trained with one
    * joiner and applied with another silently stops matching after
    * round 1: later rules reference joiner-fused symbols the mismatched
    * inference never produces). */
  def applyMerges(docs: DataFrame, textCol: String, trained: Result): DataFrame =
    applyMerges(docs, textCol, trained.merges, trained.joiner)

  /** [[applyMerges]] with a localCheckpoint every `batch` rules, keeping
    * expression-tree depth bounded for large vocabularies. */
  def applyMergesCheckpointed(docs: DataFrame, textCol: String,
      merges: Seq[MergeRule], joiner: String = "\u0001",
      batch: Int = 64): DataFrame = {
    require(batch > 0, "batch must be positive")
    merges.sortBy(_.round).grouped(batch).foldLeft(docs)((d, g) =>
      applyMerges(d, textCol, g, joiner).localCheckpoint())
  }

  /** Train a merge table. `batchSize` (round 9) is the SentencePiece-
    * style batch-promotion knob: instead of one Spark job per promoted
    * merge, each job collects the top candidates of ONE corpus-wide
    * pair count and greedily promotes up to `batchSize` of them whose
    * symbols are pairwise DISJOINT (a candidate sharing either symbol
    * with an already-accepted pair is deferred to the next job's
    * recount -- its count would be invalidated by the accepted merge).
    * Disjoint-symbol merges cannot overlap in the corpus, so their
    * occurrence counts are mutually invariant and applying them in one
    * fused projection chain is exactly sequential promotion -- UNLESS a
    * pair newly created by an accepted merge would have out-ranked a
    * later acceptance; that is the documented approximation every
    * batched BPE trainer makes, and `batchSize = 1` (the default)
    * remains the exact sequential reference. At `batchSize = 64` a
    * 32k-merge vocabulary costs ~500 Spark jobs instead of 32k -- the
    * round-8 verdict's scale ceiling on this operator. The top-ranked
    * candidate is always accepted, so every job makes progress
    * regardless of conflicts. */
  def train(docs: DataFrame, textCol: String, rounds: Int,
      minCount: Long = 2L, joiner: String = "\u0001",
      batchSize: Int = 1): Result = {
    require(rounds > 0, "rounds must be positive")
    require(minCount > 0, "minCount must be positive")
    require(batchSize > 0, "batchSize must be positive")
    import OpsUtil.ckptRdds
    var cur = docs.localCheckpoint()
    val merges = Seq.newBuilder[MergeRule]
    var round = 0
    var exhausted = false
    while (round < rounds && !exhausted) {
      val want = math.min(batchSize, rounds - round)
      // Oversample the candidate list: deferrals (shared-symbol
      // conflicts) consume rank slots without consuming promotions;
      // anything deferred past the oversample is recounted next job.
      // Still a TakeOrdered collect of <= 4*want tiny rows, never data.
      val t = TextFunctions.tokens(col(textCol))
      val top = cur
        .select(explode(arrays_zip(
          slice(t, lit(1), greatest(size(t) - 1, lit(0))),
          slice(t, lit(2), greatest(size(t) - 1, lit(0))))).as("p"))
        .select(col("p.0").as("left"), col("p.1").as("right"))
        .groupBy("left", "right").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("left").asc, col("right").asc)
        .limit(if (want == 1) 1 else want * 4)
        .collect()
      val used = scala.collection.mutable.Set.empty[String]
      val accepted = top.iterator
        .filter(_.getAs[Long]("n") >= minCount)
        .map(r => (r.getAs[String]("left"), r.getAs[String]("right"),
          r.getAs[Long]("n")))
        .filter { case (l, r, _) =>
          if (used.contains(l) || used.contains(r)) false
          else { used += l; used += r; true }
        }
        .take(want).toSeq
      if (accepted.isEmpty) exhausted = true
      else {
        accepted.foreach { case (l, r, n) =>
          merges += MergeRule(round, l, r, n, l + joiner + r)
          round += 1
        }
        val next = accepted.foldLeft(cur) { case (d, (l, r, _)) =>
          d.withColumn(textCol, applyMerge(col(textCol), l, r, joiner))
        }.localCheckpoint()
        val superseded = ckptRdds(cur)
        cur = next
        superseded.foreach(_.unpersist(blocking = false))
      }
    }
    Result(merges.result(), cur, joiner)
  }
}
