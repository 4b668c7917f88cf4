package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.Merge
import graft.pipeline.{TradeInPipeline, TradeInSchema}

/** Structured-Streaming re-expression of the reference's scheduling layer
  * (SURVEY.md §2.9): the timer-triggered daily batch
  * (`function.json:8` cron `0 0 6 * * *`) becomes a file-source stream
  * with `Trigger.AvailableNow` — each activation drains whatever landed
  * since the last checkpoint and stops, which is exactly a scheduled
  * batch with exactly-once source tracking for free (T1).
  *
  * The stage transform is the same pure-column code the batch pipeline
  * uses — streaming and batch share one logical plan; the MERGE runs in
  * `foreachBatch` (the canonical streaming-upsert pattern, since MERGE
  * needs a full view of the target).
  *
  * At scale: the file source lists incrementally from the checkpoint, the
  * stage projection is shuffle-free, and each micro-batch's merge
  * broadcasts the (small, daily) batch side against the target.
  */
object StreamingEtl {

  /** T1: drain `sourceDir` (JSON-lines batches in the raw 41-col API
    * shape), stage, and MERGE each micro-batch into the parquet snapshot
    * at `targetPath`. Returns after the AvailableNow drain completes. */
  def ingestAvailableNow(
      spark: SparkSession,
      sourceDir: String,
      targetPath: String,
      checkpointDir: String,
      now: () => org.apache.spark.sql.Column = () => current_timestamp()): Unit = {

    val rawSchema = StructType(TradeInSchema.rawColumns.map(c =>
      org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType)))
    val staged = TradeInPipeline.stage(
      spark.readStream.schema(rawSchema).json(sourceDir), now())

    val q = staged.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val target = readTargetOrEmpty(batch.sparkSession, targetPath)
        Merge.writeSnapshot(
          TradeInPipeline.mergeIntoTarget(target, batch.toDF(), now()), targetPath)
        ()
      }
      .start()
    q.awaitTermination()
  }

  private def readTargetOrEmpty(spark: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      spark.read.schema(TradeInSchema.targetSchema).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], TradeInSchema.targetSchema)
  }

  /** W1 streaming analogue: exactly-once-per-key dedup with bounded state
    * — the watermark ages out keys older than `delay`, so state is
    * O(keys per delay window), not O(all history). */
  def dedupStream(stream: DataFrame, eventTimeCol: String, delay: String,
      keys: Seq[String]): DataFrame =
    stream.withWatermark(eventTimeCol, delay)
      .dropDuplicates(keys :+ eventTimeCol)

  /** A1/T2 streaming analogue: event-time tumbling counts with a
    * watermark bounding late data (the batch q15/q38 plan under
    * readStream — same groupBy(window(...)) expression). */
  def windowedCounts(stream: DataFrame, eventTimeCol: String, delay: String,
      windowDur: String, keyCol: String): DataFrame =
    stream.withWatermark(eventTimeCol, delay)
      .groupBy(window(col(eventTimeCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col(keyCol), col("n"))

  /** Per-key running state (T4's cross-run state, streaming form):
    * arbitrary stateful aggregation via mapGroupsWithState — here a
    * running (count, sum) per key, the minimal shape of a custom state
    * machine (session builders, CDC reconcilers, …). */
  final case class KeyedTotals(key: Long, n: Long, total: Double)
  def runningTotals(events: Dataset[(Long, Double)]): Dataset[KeyedTotals] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[KeyedTotals, KeyedTotals](GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[(Long, Double)], state: GroupState[KeyedTotals]) =>
          val prev = state.getOption.getOrElse(KeyedTotals(key, 0L, 0.0))
          val next = rows.foldLeft(prev) { case (acc, (_, v)) =>
            KeyedTotals(key, acc.n + 1, acc.total + v)
          }
          state.update(next)
          next
      }
  }
}
