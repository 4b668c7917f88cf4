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
    * applied (checkpointed — safe to use without recomputing the loop). */
  case class Result(merges: Seq[MergeRule], corpus: DataFrame)

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
      joiner: String = ""): DataFrame =
    merges.sortBy(_.round).foldLeft(docs)((d, m) =>
      d.withColumn(textCol, applyMerge(col(textCol), m.left, m.right, joiner)))

  /** [[applyMerges]] with a localCheckpoint every `batch` rules, keeping
    * expression-tree depth bounded for large vocabularies. */
  def applyMergesCheckpointed(docs: DataFrame, textCol: String,
      merges: Seq[MergeRule], joiner: String = "",
      batch: Int = 64): DataFrame = {
    require(batch > 0, "batch must be positive")
    merges.sortBy(_.round).grouped(batch).foldLeft(docs)((d, g) =>
      applyMerges(d, textCol, g, joiner).localCheckpoint())
  }

  def train(docs: DataFrame, textCol: String, rounds: Int,
      minCount: Long = 2L, joiner: String = "\u0001"): Result = {
    require(rounds > 0, "rounds must be positive")
    require(minCount > 0, "minCount must be positive")
    import OpsUtil.ckptRdds
    var cur = docs.localCheckpoint()
    val merges = Seq.newBuilder[MergeRule]
    var round = 0
    var exhausted = false
    while (round < rounds && !exhausted) {
      val t = TextFunctions.tokens(col(textCol))
      val top = cur
        .select(explode(arrays_zip(
          slice(t, lit(1), greatest(size(t) - 1, lit(0))),
          slice(t, lit(2), greatest(size(t) - 1, lit(0))))).as("p"))
        .select(col("p.0").as("left"), col("p.1").as("right"))
        .groupBy("left", "right").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("left").asc, col("right").asc)
        .limit(1).collect()
      if (top.isEmpty || top.head.getAs[Long]("n") < minCount) exhausted = true
      else {
        val (l, r, n) = (top.head.getAs[String]("left"),
          top.head.getAs[String]("right"), top.head.getAs[Long]("n"))
        merges += MergeRule(round, l, r, n, l + joiner + r)
        val next = cur
          .withColumn(textCol, applyMerge(col(textCol), l, r, joiner))
          .localCheckpoint()
        val superseded = ckptRdds(cur)
        cur = next
        superseded.foreach(_.unpersist(blocking = false))
        round += 1
      }
    }
    Result(merges.result(), cur)
  }
}
