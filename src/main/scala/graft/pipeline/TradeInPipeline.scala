package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Timestamps
import graft.operators.{Dedup, Merge, Retention}
import graft.sources.ApiSource
import TradeInSchema._

/** The reference's actual product: the 6-stage daily ETL
  * (`run_etl`, rqtradein_etl.py:12-24) —
  *
  *   connect → DDL → fetch → load staging → merge → counts/retention
  *
  * — re-expressed Spark-first. "Connect" and "DDL" become catalog
  * operations ([[CatalogDdl]]); "fetch" is an [[graft.sources.ApiSource]];
  * the load/merge/retention stages are pure DataFrame transforms composed
  * here, with persistence as parquet snapshot swaps
  * ([[graft.operators.Merge.writeSnapshot]]).
  *
  * Every stage is also exposed as a standalone function on fixed inputs
  * (fixed `now`) so the whole pipeline is deterministic under test —
  * the driver's oracle checks run the stage functions; `run` wires them
  * to storage.
  *
  * Scale posture: the daily source batch is small relative to the target
  * (one day vs. all history) — the merge's full-outer join broadcasts the
  * source side under AQE. The staging table never exceeds ~2 days of data
  * by construction (retention). The target snapshot rewrite is the one
  * full-table cost; on a date-partitioned target, writers should swap
  * only partitions present in the source (documented on
  * [[graft.operators.Merge.writeSnapshot]]).
  */
object TradeInPipeline {

  /** Staging normal form for parsed timestamps: 6-digit-fraction local
    * string (staging columns are VARCHAR — rqtradein_etl.py:43-89). */
  private val StagingTsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  /** Stage 4 (load staging): normalize one raw API batch into the 44-col
    * all-string staging shape (rqtradein_etl.py:229-336).
    *
    *  - `TradeInDate`/`PostTime`/`ResponseTime` are multi-format parsed
    *    (F2/F10); unparseable-but-present values fall back to `now` (F4,
    *    rqtradein_etl.py:319-322) and are re-rendered in staging normal
    *    form;
    *  - each derives an `…EST` sibling: the EST wall-clock at seconds
    *    precision, as a string (F3/F5, rqtradein_etl.py:324-335);
    *  - `ETLRowInsertedEST` audit stamp (staging DDL default GETDATE()).
    *
    * `now` is a parameter, not `current_timestamp()`, so runs are
    * replayable and testable. */
  def stage(raw: DataFrame, now: Column): DataFrame = {
    val withParsed = tsPairs.foldLeft(raw) { case (df, (src, est)) =>
      val parsed = Timestamps.parseWithNowFallback(col(src), now)
      df.withColumn(src, date_format(parsed, StagingTsFmt))
        .withColumn(est, Timestamps.toEstString(parsed))
    }
    withParsed.select(columns.map(col) :+ now.as(insertedCol): _*)
  }

  /** Quarantine split: rows whose `TradeInDate` is present but
    * unparseable — exactly the rows the F4 fallback silently stamps with
    * `now` (rqtradein_etl.py:319-322). The reference loses them in the
    * fallback; a production pipeline routes them to a side table for
    * inspection while the main flow proceeds. Both frames derive from
    * one predicate, so with the input materialized (staging table / one
    * persist) the split costs two map-side filters, no shuffle. */
  def quarantine(raw: DataFrame): (DataFrame, DataFrame) = {
    val bad = col("TradeInDate").isNotNull &&
      Timestamps.parseTimestamp(col("TradeInDate")).isNull
    (raw.filter(!bad), raw.filter(bad))
  }

  /** Stage-5 dedup: latest row per SaleInvoiceID by TradeInDate — the
    * reference's `ROW_NUMBER() OVER (PARTITION BY SaleInvoiceID ORDER BY
    * TradeInDate DESC)` CTE (rqtradein_etl.py:167-171). `tieBreak` extends
    * the ordering for deterministic results (the reference leaves ties to
    * the engine). Staging normal form sorts identically as string or
    * timestamp. */
  def dedupSource(staging: DataFrame, tieBreak: Seq[Column] = Nil): DataFrame =
    // Window form, deliberately: the max_by aggregation alternative
    // (Dedup.latestPerKeyByMax) measured 3× SLOWER here — at the daily
    // batch's ~10% duplicate rate almost every group is a singleton, so
    // the aggregate copies every 44-col row struct into its buffer for
    // nothing, while the window sorts each partition once. The agg form
    // wins only when duplicates dominate (see its scaladoc).
    Dedup.latestPerKey(staging, Seq("SaleInvoiceID"),
      col("TradeInDate").desc +: tieBreak)

  /** Stage 5 (merge): dedup staging, type it, MERGE into target on
    * SaleInvoiceID with audit stamps — matched rows take all source
    * values and `ETLRowUpdatedEST = now`; new rows stamp
    * `ETLRowInsertedEST = now` (rqtradein_etl.py:150-185). */
  def mergeIntoTarget(target: DataFrame, staging: DataFrame, now: Column,
      tieBreak: Seq[Column] = Nil, actionCol: Option[String] = None): DataFrame = {
    val source = toTyped(dedupSource(staging, tieBreak))
    Merge.upsert(target, source, "SaleInvoiceID", columns,
      audit = Some((insertedCol, updatedCol, now)), actionCol = actionCol)
  }

  /** Partition column of the partition-scoped target layout: the
    * trade-in business day. Stored as a directory key
    * (`TradeInDay=yyyy-MM-dd/`), re-derived on read, dropped from the
    * logical row by [[TradeInPipeline.readTarget]]. */
  val partitionDayCol = "TradeInDay"

  /** Stage 5, partition-scoped (SURVEY.md §4.3's prescribed default):
    * dedup + type the staging batch and MERGE it into the
    * `TradeInDay`-partitioned parquet target at `targetPath`, rewriting
    * ONLY the partitions the batch touches — the reference's daily batch
    * spans 1–2 business days, so the daily run reads and rewrites 1–2
    * partitions of years of history instead of snapshotting the world
    * (the [[mergeIntoTarget]] + writeSnapshot fallback). Date
    * corrections that move an invoice across days are handled by
    * [[graft.operators.Merge.upsertPartitioned]]'s moved-key probe.
    * Returns the partition values rewritten.
    *
    * `partDay` is the partition expression over the typed source row —
    * `to_date(TradeInDate)` by default; coarser keys (month) suit
    * backfills whose batches span years. Staging rows always carry a
    * parseable `TradeInDate` (stage()'s F4 fallback), so the partition
    * value is never null. */
  def mergeIntoTargetPartitioned(
      spark: SparkSession, targetPath: String, staging: DataFrame,
      now: Column, tieBreak: Seq[Column] = Nil,
      partDay: Column = to_date(col("TradeInDate"))): Seq[String] = {
    val source = toTyped(dedupSource(staging, tieBreak))
      // upsert reads audit stamps from the target side; the source only
      // needs the columns PRESENT so the target slice retains them.
      .withColumn(updatedCol, lit(null).cast("timestamp"))
      .withColumn(partitionDayCol, partDay)
    Merge.upsertPartitioned(spark, targetPath, source, "SaleInvoiceID",
      partitionDayCol, columns :+ partitionDayCol,
      audit = Some((insertedCol, updatedCol, now)))
  }

  /** Stage 6a (counts): rows inserted/updated "today" relative to `now`.
    * The reference compares a DATETIME to a date (`ETLRowInsertedEST =
    * CONVERT(date, GETDATE())`, rqtradein_etl.py:188-189) which only
    * matches midnight stamps — a latent bug; the evident intent,
    * date-equality, is implemented here. */
  def todayCounts(target: DataFrame, now: Column): (Long, Long) = {
    val agg = target.agg(
      count(when(col(insertedCol).cast("date") === now.cast("date"), 1)),
      count(when(col(updatedCol).cast("date") === now.cast("date"), 1))
    ).head()
    (agg.getLong(0), agg.getLong(1))
  }

  /** Merge with piggybacked counts: the inserted/updated totals the
    * reference reports (rqtradein_etl.py:188-190) collected by
    * `Dataset.observe` DURING the merge's one write pass — where
    * [[todayCounts]] re-scans the written target, this costs zero extra
    * jobs at any scale. Read the counts from the returned Observation
    * AFTER an action has consumed the frame. */
  def mergeObserved(target: DataFrame, staging: DataFrame, now: Column)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation()
    val merged = mergeIntoTarget(target, staging, now, actionCol = Some("__action"))
      .observe(obs,
        count(when(col("__action") === "insert", 1)).as("inserted"),
        count(when(col("__action") === "update", 1)).as("updated"))
      .drop("__action")
    (merged, obs)
  }

  /** Stage 6b (retention): keep only staging rows whose TradeInDate falls
    * on `now`'s date — the relational dual of the reference's DELETE
    * (rqtradein_etl.py:192). On a date-partitioned staging layout this is
    * pure partition pruning. */
  def retainToday(staging: DataFrame, now: Column): DataFrame =
    Retention.retain(staging,
      Timestamps.parseTimestamp(col("TradeInDate")).cast("date") === now.cast("date"))

  /** ETL outcome (the reference returns {"inserted": …, "updated": …}).
    * `metrics` is the run's observability artifact — the App Insights
    * analogue (host.json:4-11): per-stage wall latencies (`*_ms`) plus
    * row counts collected by `Dataset.observe` DURING the runs' own
    * write passes (`staged_rows`, `retained_rows`) — zero extra scans
    * at any scale. Defaulted so stage-level callers are unaffected. */
  final case class EtlResult(inserted: Long, updated: Long,
      metrics: Map[String, Long] = Map.empty)

  /** Catalog names mirroring the reference's `api.*` tables, with the
    * legacy staging name handled by rename migration. */
  final case class Names(
      staging: String = "RQTradeinReportStaging",
      legacyStaging: String = "RQTradeinReport_staging",
      target: String = "RQTradeinReport")
}

/** Orchestrated pipeline over parquet snapshot paths — the `run_etl`
  * composition with storage wired in. `source` abstracts the REST fetch;
  * `now` is injectable for replayable runs. */
final class TradeInPipeline(
    source: ApiSource,
    stagingPath: String,
    targetPath: String,
    names: TradeInPipeline.Names = TradeInPipeline.Names(),
    registerCatalog: Boolean = true,
    now: () => Column = () => current_timestamp(),
    // Partition-scoped target by default (SURVEY §4.3): the daily merge
    // rewrites only the TradeInDay partitions present in the batch.
    // `false` falls back to the flat full-snapshot layout — only for
    // small targets where a whole-table rewrite is acceptable.
    partitionedTarget: Boolean = true,
    // Run-level deadline — the reference caps a whole run at 90 minutes
    // (host.json:3, functionTimeout 01:30:00). Checked at every stage
    // boundary (the driver-side analogue of the platform kill: a Spark
    // job already in flight finishes its stage; the run refuses to
    // START the next one past the deadline). The per-REQUEST 120 s
    // timeout lives in ApiSource; this is the envelope above it.
    runTimeoutMillis: Long = 90L * 60L * 1000L) {

  import TradeInPipeline._
  import TradeInSchema._

  private def readOrEmpty(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Target rows in `targetSchema` shape regardless of layout: the
    * partitioned layout re-derives `TradeInDay` from directories, which
    * this drops (an explicit-schema read would reject the extra column). */
  private def readTarget(spark: SparkSession): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(targetPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], targetSchema)
    else if (partitionedTarget)
      spark.read.parquet(targetPath)
        .select(targetSchema.fieldNames.map(org.apache.spark.sql.functions.col).toSeq: _*)
    else spark.read.schema(targetSchema).parquet(targetPath)
  }

  /** One daily run: fetch → stage/append → merge → counts → retention.
    * Returns the reference's inserted/updated counts plus the run's
    * metrics map (per-stage latency, observed row counts — see
    * [[TradeInPipeline.EtlResult]]). Refuses to start a stage past the
    * `runTimeoutMillis` deadline. */
  def run(spark: SparkSession, params: Map[String, String]): EtlResult = {
    val nowCol = now()
    val runStart = System.nanoTime()
    val metrics = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    def timed[A](stageName: String)(body: => A): A = {
      val elapsedMs = (System.nanoTime() - runStart) / 1000000L
      if (elapsedMs > runTimeoutMillis)
        throw new java.util.concurrent.TimeoutException(
          s"TradeInPipeline.run exceeded runTimeoutMillis=$runTimeoutMillis " +
            s"(${elapsedMs} ms elapsed) before stage '$stageName'")
      val t0 = System.nanoTime()
      val out = body
      metrics(s"${stageName}_ms") = (System.nanoTime() - t0) / 1000000L
      out
    }

    // 1-2. connect + DDL (catalog lifecycle, incl. legacy-name migration).
    timed("ddl") {
      if (registerCatalog) {
        CatalogDdl.migrateRename(spark, names.legacyStaging, names.staging)
        CatalogDdl.ensureTable(spark, names.staging, stagingSchema, Some(stagingPath))
        CatalogDdl.ensureTable(spark, names.target, targetSchema, Some(targetPath))
      }
    }

    // 3. fetch (source impls own retry/backoff + per-request timeout).
    // Metric caveat: for LAZY DataFrame sources, fetch_ms measures only
    // driver-side plan construction — the actual read executes inside
    // the staging write, so its cost lands in load_staging_ms. Eager
    // sources (HttpJsonSource materializes on the driver) attribute
    // fully here. Interpret (fetch_ms + load_staging_ms) as the
    // end-to-end ingest cost regardless of source laziness.
    val raw = timed("fetch")(source.fetch(spark, params))

    // 4. load staging: append this batch to what retention left behind.
    // `staged_rows` rides the write via observe — no extra scan.
    timed("load_staging") {
      val staged = stage(raw, nowCol)
      val stagingAll =
        readOrEmpty(spark, stagingPath, stagingSchema).unionByName(staged)
      val obs = org.apache.spark.sql.Observation()
      Merge.writeSnapshot(
        stagingAll.observe(obs, count(lit(1)).as("staged_rows")), stagingPath)
      metrics("staged_rows") = obs.get("staged_rows").asInstanceOf[Long]
    }

    // 5. merge into target — partition-scoped by default: only the
    // TradeInDay partitions present in this batch are read and
    // rewritten (plus any moved-key partitions the probe finds).
    val staging = spark.read.schema(stagingSchema).parquet(stagingPath)
    timed("merge") {
      if (partitionedTarget)
        mergeIntoTargetPartitioned(spark, targetPath, staging, nowCol)
      else
        Merge.writeSnapshot(
          mergeIntoTarget(readOrEmpty(spark, targetPath, targetSchema), staging, nowCol),
          targetPath)
    }

    // 6. counts + staging retention (`retained_rows` observed in-pass).
    val (ins, upd) = timed("counts") {
      todayCounts(readTarget(spark), nowCol)
    }
    timed("retention") {
      val obs = org.apache.spark.sql.Observation()
      Merge.writeSnapshot(
        retainToday(staging, nowCol)
          .observe(obs, count(lit(1)).as("retained_rows")), stagingPath)
      metrics("retained_rows") = obs.get("retained_rows").asInstanceOf[Long]
    }
    metrics("run_ms") = (System.nanoTime() - runStart) / 1000000L
    EtlResult(ins, upd, metrics.toMap)
  }
}
