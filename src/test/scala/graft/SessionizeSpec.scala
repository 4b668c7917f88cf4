package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Merge, Sessionize}

class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events(rows: (Int, String, Long)*) = {
    import spark.implicits._
    rows.toSeq.map { case (u, t, id) => (u, ts(t), id) }
      .toDF("user_id", "ts", "event_id")
  }

  test("sessionize splits on gaps strictly greater than the bound") {
    val df = events(
      (1, "2024-01-01 10:00:00", 1),
      (1, "2024-01-01 10:05:00", 2),  // 300s gap → same session
      (1, "2024-01-01 10:15:00", 3),  // exactly 600s → same session (strict >)
      (1, "2024-01-01 10:25:00.000001", 4), // 600.000001s → new session
      (2, "2024-01-01 10:00:00", 5))
    val out = Sessionize.sessionize(df, "user_id", "ts", 600,
        tieBreak = Seq(col("event_id")))
      .select("event_id", "session_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1 && out(2L) == 1 && out(3L) == 1)
    assert(out(4L) == 2)
    assert(out(5L) == 1) // sessions are per-key
  }

  test("sessionStats aggregates bounds per (key, session)") {
    val df = events(
      (1, "2024-01-01 10:00:00", 1),
      (1, "2024-01-01 10:05:00", 2),
      (1, "2024-01-01 11:00:00", 3))
    val out = Sessionize.sessionStats(df, "user_id", "ts", 600,
        measure = count(lit(1)).as("m"), tieBreak = Seq(col("event_id")))
      .orderBy("session_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n") == 2)
    assert(out(0).getAs[Timestamp]("s_start") == ts("2024-01-01 10:00:00"))
    assert(out(0).getAs[Timestamp]("s_last") == ts("2024-01-01 10:05:00"))
    assert(out(1).getAs[Long]("n") == 1)
  }

  test("scd2History builds adjacent validity intervals with one current row per key") {
    import spark.implicits._
    val changes = Seq(
      (10, ts("2024-01-01 00:00:00"), 1L),
      (10, ts("2024-02-01 00:00:00"), 2L),
      (10, ts("2024-03-01 00:00:00"), 3L),
      (20, ts("2024-01-15 00:00:00"), 4L))
      .toDF("k", "changed_at", "change_id")
    val hist = Merge.scd2History(changes, "k", "changed_at",
        tieBreak = Seq(col("change_id")))
      .orderBy("k", "effective_from").collect()
    // key 10: [jan→feb), [feb→mar), [mar→null)
    assert(hist(0).getAs[Timestamp]("effective_to") == ts("2024-02-01 00:00:00"))
    assert(hist(1).getAs[Timestamp]("effective_to") == ts("2024-03-01 00:00:00"))
    assert(hist(2).getAs[Timestamp]("effective_to") == null)
    assert(hist.count(_.getAs[Boolean]("is_current")) == 2) // one per key
    assert(hist(3).getAs[Boolean]("is_current"))
  }

  test("scd2History simultaneous changes: later tie-break row supersedes") {
    import spark.implicits._
    val t0 = ts("2024-01-01 00:00:00")
    val changes = Seq((10, t0, 1L), (10, t0, 2L)).toDF("k", "changed_at", "change_id")
    val hist = Merge.scd2History(changes, "k", "changed_at",
        tieBreak = Seq(col("change_id")))
      .orderBy("change_id").collect()
    assert(!hist(0).getAs[Boolean]("is_current"))
    assert(hist(1).getAs[Boolean]("is_current"))
  }
}
