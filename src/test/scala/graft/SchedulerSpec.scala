package graft

import java.time.{Duration, LocalDate, LocalDateTime}

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Scheduler

/** T1/T2/T3 + F8 scheduling semantics (rq_tradein_report/__init__.py). */
class SchedulerSpec extends AnyFunSuite {

  test("F8/T2: window is [yesterday, today] — the 1-day overlap lookback") {
    assert(Scheduler.windowParams(LocalDate.parse("2024-06-02")) ==
      Map("StartDate" -> "2024-06-01", "StopDate" -> "2024-06-02"))
    // Month/year boundaries are plain calendar arithmetic.
    assert(Scheduler.windowParams(LocalDate.parse("2024-03-01"))("StartDate") == "2024-02-29")
    assert(Scheduler.windowParams(LocalDate.parse("2024-01-01"))("StartDate") == "2023-12-31")
  }

  test("T1: next fire is today 06:00 before the hour, tomorrow after") {
    assert(Scheduler.nextFire(LocalDateTime.parse("2024-06-01T05:59:00")) ==
      LocalDateTime.parse("2024-06-01T06:00:00"))
    assert(Scheduler.nextFire(LocalDateTime.parse("2024-06-01T06:00:00")) ==
      LocalDateTime.parse("2024-06-02T06:00:00"))
  }

  test("T3: pastDue respects the grace period") {
    val sched = LocalDateTime.parse("2024-06-01T06:00:00")
    assert(!Scheduler.pastDue(sched, sched.plusSeconds(30)))
    assert(Scheduler.pastDue(sched, sched.plusMinutes(5)))
    assert(!Scheduler.pastDue(sched, sched.plusMinutes(5), Duration.ofMinutes(10)))
  }

  test("T3: missedFires enumerates every fire in an outage window") {
    val got = Scheduler.missedFires(
      LocalDateTime.parse("2024-06-01T07:00:00"),
      LocalDateTime.parse("2024-06-04T06:30:00"))
    assert(got == Seq("2024-06-02T06:00", "2024-06-03T06:00", "2024-06-04T06:00")
      .map(LocalDateTime.parse))
  }

  test("run-level deadline: a run past runTimeoutMillis refuses the next " +
    "stage (host.json:3 functionTimeout analogue)") {
    import TestSpark._
    import org.apache.spark.sql.functions.lit
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    import graft.pipeline.{TradeInPipeline, TradeInSchema}
    val work = java.nio.file.Files.createTempDirectory("tidl").toString
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(TradeInSchema.rawColumns.map(c => StructField(c, StringType))))
    // A source that burns past the (tiny) deadline during fetch: the
    // NEXT stage boundary must refuse to start, naming the budget.
    val slow = new graft.sources.ApiSource {
      override def fetch(s: org.apache.spark.sql.SparkSession,
          params: Map[String, String]): org.apache.spark.sql.DataFrame = {
        Thread.sleep(30); empty
      }
    }
    val p = new TradeInPipeline(slow,
      stagingPath = s"$work/staging", targetPath = s"$work/target",
      registerCatalog = false,
      now = () => lit("2024-06-01 06:00:00").cast("timestamp"),
      runTimeoutMillis = 10L)
    val ex = intercept[java.util.concurrent.TimeoutException] {
      p.run(spark, Map())
    }
    assert(ex.getMessage.contains("runTimeoutMillis=10"))
    // the default envelope (90 min) never trips a normal run
    val ok = new TradeInPipeline(new graft.sources.FrameSource(empty),
      stagingPath = s"$work/staging2", targetPath = s"$work/target2",
      registerCatalog = false,
      now = () => lit("2024-06-01 06:00:00").cast("timestamp"))
      .run(spark, Map())
    assert(ok.inserted == 0L && ok.metrics.contains("run_ms"))
  }
}
