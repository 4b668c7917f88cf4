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

  test("interEventStats: exact integer moments, CV null on zero-sum gaps") {
    val df = events(
      // user 1: gaps 60, 60, 120 -> n=3, mean=80, Σg=240, Σg²=21600
      // cv = sqrt(3·21600 − 240²)/240 = sqrt(7200)/240 = 0.353553
      (1, "2024-01-01 10:00:00", 1), (1, "2024-01-01 10:01:00", 2),
      (1, "2024-01-01 10:02:00", 3), (1, "2024-01-01 10:04:00", 4),
      // user 2: both events in the same second -> Σg=0 -> cv null
      (2, "2024-01-01 10:00:00", 5), (2, "2024-01-01 10:00:00", 6),
      // user 3: single event -> no gaps -> no row
      (3, "2024-01-01 10:00:00", 7))
    val out = Sessionize.interEventStats(df, "user_id", "ts",
        tieBreak = Seq(col("event_id")))
      .orderBy("user_id").collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 3L && out(0).getDouble(2) == 80.0)
    assert(out(0).getDouble(3) == 0.353553)
    assert(out(1).getLong(1) == 1L && out(1).getDouble(2) == 0.0)
    assert(out(1).isNullAt(3))
  }

  test("funnelAnyOrder counts out-of-order completions the ordered funnel rejects") {
    import spark.implicits._
    val df = Seq(
      // user 1: view -> click -> buy, in order (both funnels count it)
      (1, "2024-01-01 10:00:00", "view"), (1, "2024-01-01 10:01:00", "click"),
      (1, "2024-01-01 10:02:00", "buy"),
      // user 2: buy BEFORE click (out of the prescribed order, all after
      // the anchor view) — any-order completes all 3; ordered finds the
      // click at 10:02 but no buy strictly after it, stopping at step 2
      (2, "2024-01-01 10:00:00", "view"), (2, "2024-01-01 10:01:00", "buy"),
      (2, "2024-01-01 10:02:00", "click"),
      // user 3: view only
      (3, "2024-01-01 10:00:00", "view"))
      .map { case (u, t, ty) => (u, ts(t), ty) }
      .toDF("user_id", "ts", "event_type")
    def counts(out: Array[org.apache.spark.sql.Row]) =
      out.sortBy(_.getAs[Int]("step")).map(_.getAs[Long]("n_keys")).toList
    val any = Sessionize.funnelAnyOrder(df, "user_id", "ts", "event_type",
      Seq("view", "click", "buy"), windowSeconds = 3600).collect()
    val ord = Sessionize.funnel(df, "user_id", "ts", "event_type",
      Seq("view", "click", "buy"), windowSeconds = 3600).collect()
    assert(counts(any) == List(3L, 2L, 2L)) // user 2 counts despite order
    assert(counts(ord) == List(3L, 2L, 1L)) // ordered stops user 2 at click
  }

  test("funnels reject duplicate steps; exotic step names survive (index-based flags)") {
    import spark.implicits._
    val df = Seq((1, ts("2024-01-01 10:00:00"), "a.b"),
      (1, ts("2024-01-01 10:01:00"), "c`d"))
      .toDF("user_id", "ts", "event_type")
    // duplicates are a contract error, not a downstream AnalysisException
    intercept[IllegalArgumentException](Sessionize.funnel(
      df, "user_id", "ts", "event_type", Seq("a.b", "a.b"), 3600))
    intercept[IllegalArgumentException](Sessionize.funnelAnyOrder(
      df, "user_id", "ts", "event_type", Seq("a.b", "a.b"), 3600))
    // step strings that would collide/break as COLUMN names are fine as
    // values: the presence flags are named by index
    val out = Sessionize.funnelAnyOrder(df, "user_id", "ts", "event_type",
      Seq("a.b", "c`d"), 3600).collect()
    assert(out.sortBy(_.getAs[Int]("step")).map(_.getAs[Long]("n_keys")).toList
      == List(1L, 1L))
  }

  test("entryConversion attributes conversion to the session's first event type") {
    import spark.implicits._
    val df = Seq(
      // user 1, session 1: view -> purchase (entry view, converted)
      (1, "2024-01-01 10:00:00", "view", 1L),
      (1, "2024-01-01 10:01:00", "purchase", 2L),
      // user 1, session 2 (gap > 600s): view only (entry view, not conv)
      (1, "2024-01-01 12:00:00", "view", 3L),
      // user 2: search entry, no purchase
      (2, "2024-01-01 10:00:00", "search", 4L),
      // user 3: equal timestamps — event_id tiebreak picks 'view' entry
      (3, "2024-01-01 10:00:00", "view", 5L),
      (3, "2024-01-01 10:00:00", "purchase", 6L))
      .map { case (u, t, ty, id) => (u, ts(t), ty, id) }
      .toDF("user_id", "ts", "event_type", "event_id")
    val out = Sessionize.entryConversion(df, "user_id", "ts", "event_type",
        target = "purchase", gapSeconds = 600,
        tieBreak = Seq(col("event_id")))
      .orderBy("entry_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toList == List(
      ("search", 1L, 0L, 0.0), ("view", 3L, 2L, 0.666667)))
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

  test("funnel: ordered chains within the window, in-order only") {
    import spark.implicits._
    val events = Seq(
      // u1 completes the whole funnel in order
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-01 01:00:00"), "click"),
      (1L, ts("2024-01-01 02:00:00"), "purchase"),
      // u2 views only
      (2L, ts("2024-01-01 00:00:00"), "view"),
      // u3 clicks AFTER the 1-day window -> view only
      (3L, ts("2024-01-01 00:00:00"), "view"),
      (3L, ts("2024-01-03 00:00:00"), "click"),
      // u4 purchases BEFORE clicking -> stops at click
      (4L, ts("2024-01-01 00:00:00"), "view"),
      (4L, ts("2024-01-01 01:00:00"), "purchase"),
      (4L, ts("2024-01-01 02:00:00"), "click"),
      // u5 never views -> not in the funnel at all
      (5L, ts("2024-01-01 00:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Sessionize.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowSeconds = 86400L)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toList == List(
      (1, "view", 4L, 1.0),
      (2, "click", 2L, 0.5),      // u1 and u4
      (3, "purchase", 1L, 0.25))) // u1 only: u4's purchase precedes click
  }

  test("funnel: step time is the EARLIEST qualifying occurrence") {
    import spark.implicits._
    // the first click (01:00) is what the purchase must follow — a
    // later click (03:00) must not push the anchor forward
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-01 01:00:00"), "click"),
      (1L, ts("2024-01-01 03:00:00"), "click"),
      (1L, ts("2024-01-01 02:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val out = Sessionize.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), 86400L).orderBy("step").collect()
    assert(out.map(_.getLong(2)).toList == List(1L, 1L, 1L))
  }

  test("cohortRetention: offsets count distinct active keys against cohort size") {
    import spark.implicits._
    val w0 = ts("2024-01-04 00:00:00") // within epoch-week W
    val w1 = ts("2024-01-11 00:00:00") // W+1
    val w2 = ts("2024-01-18 00:00:00") // W+2
    val events = Seq(
      (1L, w0), (1L, w1), (1L, w1), // u1: cohort W, active W and W+1 (dup event)
      (2L, w0), (2L, w2),           // u2: cohort W, active W and W+2
      (3L, w1)                      // u3: cohort W+1
    ).toDF("user_id", "ts")
    val out = Sessionize.cohortRetention(events, "user_id", "ts")
      .orderBy("cohort_week", "week_offset").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toList == List(
      (0L, 2L, 1.0),  // both cohort-W users active in week 0
      (1L, 1L, 0.5),  // u1 only
      (2L, 1L, 0.5),  // u2 only
      (0L, 1L, 1.0))) // u3's cohort
  }

  test("funnelLatency pairs consecutive first-occurrence steps; median is the histogram order statistic") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def at(s: Long) = new java.sql.Timestamp(t0.getTime + s * 1000)
    val events = Seq(
      (1L, at(0), "view"), (1L, at(100), "click"), (1L, at(160), "purchase"),
      (2L, at(0), "view"), (2L, at(50), "click"),
      (3L, at(0), "click"),                        // no preceding view: no pair
      (4L, at(100), "view"), (4L, at(200), "purchase")) // skips click: not consecutive
      .toDF("user_id", "ts", "event_type")
    val out = Sessionize.funnelLatency(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("step_from").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    // view→click latencies [50, 100]: lower median 50, mean 75;
    // click→purchase [60]
    assert(out.toList == List(
      ("click", "purchase", 1L, 60.0, 60L),
      ("view", "click", 2L, 75.0, 50L)))
  }

  test("transitionMatrix counts consecutive pairs per key with tiebroken order") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def at(s: Long) = new java.sql.Timestamp(t0.getTime + s * 1000)
    val events = Seq(
      (1L, at(0), "A", 10L), (1L, at(60), "B", 11L), (1L, at(120), "A", 12L),
      (2L, at(0), "A", 20L), (2L, at(0), "A", 21L) // same ts: event_id orders
    ).toDF("user_id", "ts", "event_type", "event_id")
    val out = Sessionize.transitionMatrix(events, "user_id", "ts",
        "event_type", "event_id")
      .orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toList == List(
      ("A", "A", 1L, 0.5), ("A", "B", 1L, 0.5), ("B", "A", 1L, 1.0)))
  }

  test("skipgramPairs: symmetric offsets mirror, and rel_pos=1 equals transitionMatrix counts") {
    import spark.implicits._
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val ev = Seq(
      (1L, ts(0), 10L, "A"), (2L, ts(1), 10L, "B"), (3L, ts(2), 10L, "C"),
      (4L, ts(3), 10L, "A"), (5L, ts(0), 20L, "B"), (6L, ts(1), 20L, "A"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val pairs = Sessionize.skipgramPairs(ev, "user_id", "ts", "event_type",
        "event_id", window = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)) ->
        r.getAs[Long]("n")).toMap
    // mirror symmetry: (c, x, +k) must equal (x, c, -k)
    pairs.foreach { case ((c, x, k), n) =>
      assert(pairs.getOrElse((x, c, -k), 0L) == n,
        s"asymmetric pair ($c,$x,$k)")
    }
    // rel_pos = +1 IS the transition count
    val trans = Sessionize.transitionMatrix(ev, "user_id", "ts",
        "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Long]("n")).toMap
    trans.foreach { case ((f, t), n) =>
      assert(pairs.getOrElse((f, t, 1), 0L) == n)
    }
    assert(pairs(("A", "C", 2)) == 1L) // the distance-2 pair exists
  }

  test("touchAttribution: first/last credit, tiebreaks, no-prior dropout") {
    import spark.implicits._
    // u1: view -> click -> purchase : first=view, last=click
    // u2: click -> purchase -> view : post-conversion view ignored
    // u3: purchase only             : no priors, drops out
    // u4: two simultaneous events before purchase: id breaks the tie
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "click"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "purchase"),
      (2L, ts("2024-01-01 09:00:00"), 4L, "click"),
      (2L, ts("2024-01-01 09:01:00"), 5L, "purchase"),
      (2L, ts("2024-01-01 09:02:00"), 6L, "view"),
      (3L, ts("2024-01-01 08:00:00"), 7L, "purchase"),
      (4L, ts("2024-01-01 07:00:00"), 8L, "view"),
      (4L, ts("2024-01-01 07:00:00"), 9L, "click"),
      (4L, ts("2024-01-01 07:01:00"), 10L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val rows = Sessionize.touchAttribution(df, "user_id", "ts", "event_id",
        "event_type", "purchase")
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // first: u1 view, u2 click, u4 view(id 8) -> view 2, click 1
    // last:  u1 click, u2 click, u4 click(id 9) -> click 3
    assert(rows.toSeq == Seq(("click", 1L, 3L), ("view", 2L, 0L)))
  }

  test("transitionEntropy: hand contingency, zero-entropy funnel edge") {
    import spark.implicits._
    // u1: a->b->a->c; u2: a->b. pairs: (a,b)x2 (b,a) (a,c)
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "b"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "a"),
      (1L, ts("2024-01-01 10:03:00"), 4L, "c"),
      (2L, ts("2024-01-01 09:00:00"), 5L, "a"),
      (2L, ts("2024-01-01 09:01:00"), 6L, "b")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val rows = Sessionize.transitionEntropy(df, "user_id", "ts",
        "event_id", "event_type")
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val ha = -(2.0 / 3.0) * math.log(2.0 / 3.0) -
      (1.0 / 3.0) * math.log(1.0 / 3.0)
    assert(rows.length == 2) // 'c' is never a prev
    assert(rows(0)._1 == "a" && rows(0)._2 == 3 && rows(0)._3 == 2)
    assert(math.abs(rows(0)._4 - ha) < 2e-6)
    assert(rows(1) == (("b", 1L, 1L, 0.0))) // deterministic funnel edge
  }

  test("rfmSegments: hand-scored 2-bucket grid, deterministic ties") {
    import spark.implicits._
    val orders = Seq(
      (1L, "2024-01-10", 100.0),
      (2L, "2024-01-09", 50.0), (2L, "2024-01-10", 10.0),
      (3L, "2024-01-01", 300.0),
      (4L, "2024-01-05", 20.0)
    ).toDF("c", "d", "amt").withColumn("d", col("d").cast("date"))
    val out = Sessionize.rfmSegments(orders, col("c"), col("d"),
        col("amt"), buckets = 2)
      .orderBy("r_score", "f_score", "m_score")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getDouble(4)))
    // anchor 2024-01-10; recency c1=0,c2=0,c4=5,c3=9 -> r: 1,1,2,2
    // freq desc: c2(2),c1,c3,c4 -> f: c2=1,c1=1,c3=2,c4=2
    // monetary desc: c3(300),c1(100),c2(60),c4(20) -> m: 1,1,2,2
    assert(out.toList == List(
      (1, 1, 1, 1L, 100.0),   // c1
      (1, 1, 2, 1L, 60.0),    // c2
      (2, 2, 1, 1L, 300.0),   // c3
      (2, 2, 2, 1L, 20.0)))   // c4
  }
}
