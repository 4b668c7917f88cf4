package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{CatalogDdl, TradeInPipeline, TradeInSchema}
import graft.sources.FrameSource

/** End-to-end pipeline semantics (rqtradein_etl.py:12-24): two
  * overlapping daily runs with insert/update counts, staging retention,
  * and the catalog DDL lifecycle. */
class TradeInPipelineSpec extends AnyFunSuite {
  import TestSpark._

  /** Minimal raw batch: (SaleInvoiceID, TradeInDate, TradeInAmount). */
  private def rawBatch(rows: Seq[(String, String, String)]): DataFrame = {
    val full = rows.map { case (id, d, amt) =>
      Row.fromSeq(TradeInSchema.rawColumns.map {
        case "SaleInvoiceID" => id
        case "TradeInDate"   => d
        case "TradeInAmount" => amt
        case _               => null
      })
    }
    spark.createDataFrame(spark.sparkContext.parallelize(full, 1),
      StructType(TradeInSchema.rawColumns.map(c => StructField(c, StringType))))
  }

  private def pipelineAt(work: String, day: String, batch: DataFrame) =
    new TradeInPipeline(new FrameSource(batch),
      stagingPath = s"$work/staging", targetPath = s"$work/target",
      registerCatalog = false,
      now = () => lit(s"$day 06:00:00").cast("timestamp"))

  test("two overlapping runs: insert/update counts, retention, typed target") {
    val work = java.nio.file.Files.createTempDirectory("tip").toString
    val d1 = "2024-06-01"
    val d2 = "2024-06-02"
    val r1 = pipelineAt(work, d1, rawBatch(Seq(
      ("1", s"${d1}T01:00:00Z", "10.00"),
      ("2", s"${d1}T02:00:00Z", "20.00"),
      ("3", s"${d1}T03:00:00Z", "30.00")))).run(spark, Map())
    assert((r1.inserted, r1.updated) == ((3L, 0L)))

    // Day 2 re-delivers key 2 (new amount) and adds key 4; key 2 also has
    // an intra-batch duplicate resolved by the dedup window (later wins).
    val r2 = pipelineAt(work, d2, rawBatch(Seq(
      ("2", s"${d2}T01:00:00Z", "21.00"),
      ("2", s"${d2}T05:00:00Z", "22.00"),
      ("4", s"${d2}T02:00:00Z", "40.00")))).run(spark, Map())
    // Day-1 retention kept rows dated day 1, so keys 1 and 3 linger in
    // staging and re-merge on day 2 as updates alongside key 2 — faithful
    // to the reference's merge-then-retain ordering.
    assert((r2.inserted, r2.updated) == ((1L, 3L)))
    // Observability artifact: per-stage latencies plus row counts
    // observed during the run's own write passes (no extra scans).
    // staged_rows = 3 retained day-1 rows + 3 day-2 batch rows;
    // retained_rows = the 3 day-2-dated rows left after retention.
    for (k <- Seq("ddl_ms", "fetch_ms", "load_staging_ms", "merge_ms",
        "counts_ms", "retention_ms", "run_ms"))
      assert(r2.metrics.contains(k) && r2.metrics(k) >= 0L, s"missing $k")
    assert(r2.metrics("staged_rows") == 6L, r2.metrics.toString)
    assert(r2.metrics("retained_rows") == 3L, r2.metrics.toString)
    assert(r2.metrics("run_ms") >= r2.metrics("merge_ms"))

    val target = spark.read.parquet(s"$work/target")
    assert(target.count() == 4)
    val key2 = target.filter(col("SaleInvoiceID") === 2).head()
    assert(key2.getAs[java.math.BigDecimal]("TradeInAmount")
      .compareTo(new java.math.BigDecimal("22.00")) == 0)
    assert(key2.getAs[java.sql.Timestamp]("ETLRowUpdatedEST").toString
      .startsWith(d2))
    assert(key2.getAs[java.sql.Timestamp]("ETLRowInsertedEST").toString
      .startsWith(d1))

    // Retention: staging holds only day-2-dated rows (2 for key 2, 1 for 4).
    val staging = spark.read.parquet(s"$work/staging")
    assert(staging.count() == 3)
    assert(staging.select(min(col("TradeInDate"))).head().getString(0).startsWith(d2))
  }

  test("backfill: window-partitioned parallel fetch feeds the pipeline e2e") {
    import graft.sources.PartitionedWindowSource
    val work = java.nio.file.Files.createTempDirectory("tip").toString
    val days = (1 to 4).map(i => f"2024-06-0$i%1d")
    val schema = StructType(
      TradeInSchema.rawColumns.map(c => StructField(c, StringType)))
    // Executor-side fetch: 2 records per day window, each stamped with
    // the task's partition id in SerialNumber to prove where it ran.
    val src = new PartitionedWindowSource(days.map(d => Map("StartDate" -> d)),
      w => {
        val d = w("StartDate")
        val pid = org.apache.spark.TaskContext.getPartitionId()
        (1 to 2).iterator.map(i =>
          s"""{"SaleInvoiceID":"${d.takeRight(2)}0$i","TradeInDate":"${d}T0$i:00:00Z","TradeInAmount":"$i.00","SerialNumber":"task-$pid"}""")
      }, schema)
    val pipeline = new TradeInPipeline(src,
      stagingPath = s"$work/staging", targetPath = s"$work/target",
      registerCatalog = false,
      now = () => lit("2024-06-04 06:00:00").cast("timestamp"))
    val r = pipeline.run(spark, Map())
    assert((r.inserted, r.updated) == ((8L, 0L)))
    val target = spark.read.parquet(s"$work/target")
    assert(target.count() == 8)
    // all four windows landed, fetched on four distinct tasks
    assert(target.select(countDistinct(col("SerialNumber"))).head().getLong(0) == 4)
    // backfill retention: only rows dated the run's "today" survive staging
    val staging = spark.read.parquet(s"$work/staging")
    assert(staging.count() == 2)
    assert(staging.select(min(col("TradeInDate"))).head()
      .getString(0).startsWith("2024-06-04"))
  }

  test("partitioned target: a daily run leaves untouched TradeInDay partitions byte-identical") {
    val work = java.nio.file.Files.createTempDirectory("tipp").toString
    val d0 = "2024-05-30"
    val d1 = "2024-06-01"
    val d2 = "2024-06-02"
    // Day 1 batch spans two business days (late-arriving d0 row).
    val r1 = pipelineAt(work, d1, rawBatch(Seq(
      ("1", s"${d1}T01:00:00Z", "10.00"),
      ("2", s"${d1}T02:00:00Z", "20.00"),
      ("5", s"${d0}T09:00:00Z", "50.00")))).run(spark, Map())
    assert((r1.inserted, r1.updated) == ((3L, 0L)))
    val d0dir = new java.io.File(s"$work/target/TradeInDay=$d0")
    assert(d0dir.exists(), "target must be laid out by TradeInDay")
    val before = d0dir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified).toMap

    // Day 2 touches d1 (retained staging rows re-merge) and d2 — not d0.
    val r2 = pipelineAt(work, d2, rawBatch(Seq(
      ("4", s"${d2}T02:00:00Z", "40.00")))).run(spark, Map())
    assert((r2.inserted, r2.updated) == ((1L, 2L)))
    val after = d0dir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified).toMap
    assert(after == before, "untouched day partition must not be rewritten")
    assert(spark.read.parquet(s"$work/target").count() == 4)
  }

  test("quarantine splits unparseable TradeInDates; null passes through clean") {
    val raw = rawBatch(Seq(
      ("1", "2024-06-01T01:00:00Z", "10.00"),
      ("2", "not-a-date", "20.00"),
      ("3", null, "30.00")))
    val (clean, bad) = TradeInPipeline.quarantine(raw)
    assert(clean.select("SaleInvoiceID").collect().map(_.getString(0)).sorted
      .toSeq == Seq("1", "3"))
    assert(bad.select("SaleInvoiceID").collect().map(_.getString(0)).toSeq == Seq("2"))
    assert(clean.count() + bad.count() == raw.count())
  }

  test("mergeObserved reports insert/update counts from the write pass itself") {
    val now = lit("2024-06-01 06:00:00").cast("timestamp")
    val staged1 = TradeInPipeline.stage(
      rawBatch(Seq(("1", "2024-06-01T01:00:00Z", "10.00"),
        ("2", "2024-06-01T02:00:00Z", "20.00"))), now)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], TradeInSchema.targetSchema)
    val (m1, o1) = TradeInPipeline.mergeObserved(empty, staged1, now)
    m1.write.format("noop").mode("overwrite").save()
    assert(o1.get("inserted") == 2L && o1.get("updated") == 0L)

    val staged2 = TradeInPipeline.stage(
      rawBatch(Seq(("2", "2024-06-01T03:00:00Z", "21.00"),
        ("3", "2024-06-01T04:00:00Z", "30.00"))), now)
    val (m2, o2) = TradeInPipeline.mergeObserved(m1, staged2, now)
    m2.write.format("noop").mode("overwrite").save()
    assert(o2.get("inserted") == 1L && o2.get("updated") == 1L)
  }

  test("garbage TradeInDate falls back to run time (F4) and survives merge") {
    val work = java.nio.file.Files.createTempDirectory("tip").toString
    val day = "2024-06-01"
    pipelineAt(work, day, rawBatch(Seq(("9", "garbage", "1.00")))).run(spark, Map())
    val t = spark.read.parquet(s"$work/target").head()
    assert(t.getAs[java.sql.Timestamp]("TradeInDate").toString == s"$day 06:00:00.0")
  }

  test("CatalogDdl: ensureTable is idempotent; migrateRename is guarded") {
    val work = java.nio.file.Files.createTempDirectory("ddl").toString
    val schema = StructType(Seq(StructField("x", StringType)))
    CatalogDdl.ensureTable(spark, "t_old_name", schema, Some(s"$work/t"))
    CatalogDdl.ensureTable(spark, "t_old_name", schema, Some(s"$work/t")) // no-op
    assert(CatalogDdl.migrateRename(spark, "t_old_name", "t_new_name"))
    assert(spark.catalog.tableExists("t_new_name") && !spark.catalog.tableExists("t_old_name"))
    assert(!CatalogDdl.migrateRename(spark, "t_old_name", "t_new_name")) // no-op
    // Guarded: never clobbers an existing new-name table.
    CatalogDdl.ensureTable(spark, "t_old_name", schema, Some(s"$work/t2"))
    assert(!CatalogDdl.migrateRename(spark, "t_old_name", "t_new_name"))
  }
}
