package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Small shared idioms for the iterative / guarded operators. */
private[graft] object OpsUtil {

  /** The RDDs materialized by a `localCheckpoint()` in `df`'s lineage.
    * localCheckpoint blocks are invisible to `DataFrame.unpersist`; an
    * iterative operator frees each superseded round's blocks through
    * these handles so storage stays O(1) rounds instead of
    * O(iterations). Shared by [[TextDedup.dupClusters]] and
    * [[BpeTrainer.train]]. */
  def ckptRdds(df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.logical.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  /** Row-level fail-fast guard: TRUE where `cond` holds, raises with the
    * concatenated `message` otherwise — `df.where(orRaise(cond, ...))`
    * makes a scale invariant (bounded interval span, bounded block size,
    * bounded cell size) abort loudly instead of silently dominating the
    * shuffle. Shared by [[Relational.intervalJoin]],
    * [[EntityResolution.link]] and [[Similarity.semanticDedup]]. */
  def orRaise(cond: Column, message: Column*): Column =
    when(cond, lit(true)).otherwise(raise_error(concat(message: _*)))
}
