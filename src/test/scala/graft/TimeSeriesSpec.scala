package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TimeSeries

/** Gap-fill: dense per-key grid between first and last event, zero-filled
  * counts, LOCF sums. */
class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gapFill densifies per-key, zero-fills counts, carries sums forward") {
    val events = Seq(
      // user 1: events in minutes 0 and 3 of an hour-aligned span
      (1L, ts("2024-01-01 00:00:10"), 1.5),
      (1L, ts("2024-01-01 00:00:40"), 2.5), // same bucket -> sum 4.0
      (1L, ts("2024-01-01 00:03:30"), 7.0),
      // user 2: single event -> single-bucket grid, no gaps
      (2L, ts("2024-01-01 05:09:00"), 9.0)
    ).toDF("user_id", "ts", "value")
    val out = TimeSeries.gapFill(events, "user_id", "ts", "value",
        bucketSeconds = 60L)
      .orderBy("user_id", "bucket").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getLong(2), Option(r.get(3)), r.getDouble(4)))
    assert(out.toList == List(
      (1L, "2024-01-01 00:00:00.0", 2L, Some(4.0), 4.0),
      (1L, "2024-01-01 00:01:00.0", 0L, None, 4.0), // gap: count 0, LOCF
      (1L, "2024-01-01 00:02:00.0", 0L, None, 4.0),
      (1L, "2024-01-01 00:03:00.0", 1L, Some(7.0), 7.0),
      (2L, "2024-01-01 05:09:00.0", 1L, Some(9.0), 9.0)))
  }

  test("interpolate draws the time-weighted line between observed buckets") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:10"), 4.0),
      (1L, ts("2024-01-01 03:00:30"), 7.0) // 3-bucket gap at 1h cadence
    ).toDF("user_id", "ts", "value")
    val out = TimeSeries.interpolate(events, "user_id", "ts", "value", 3600L)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(2), Option(r.get(3)), r.getDouble(4)))
    assert(out.toList == List(
      (1L, Some(4.0), 4.0),
      (0L, None, 5.0), // 4 + (7-4)·(1/3)
      (0L, None, 6.0), // 4 + (7-4)·(2/3)
      (1L, Some(7.0), 7.0)))
  }

  test("interpolate rounds exact micro-unit midpoints half-up") {
    // midpoint of 1.0 and 2.000001 = 1.5000005 exactly: float paths
    // dither around the boundary, the integer path must round UP
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-01 02:00:00"), 2.000001)
    ).toDF("user_id", "ts", "value")
    val mid = TimeSeries.interpolate(events, "user_id", "ts", "value", 3600L)
      .filter("n_events = 0").collect()
    assert(mid.length == 1)
    assert(mid.head.getDouble(4) == 1.500001)
  }

  test("interpolate keeps floor-division semantics on negative values") {
    // the long-arithmetic path must agree with the decimal formula's
    // subtract-pmod floor division when sums are negative: the micro
    // midpoint of -1.0 and -2.000001 is -1500000.5, which the half-up
    // construction floor((2n+m)/(2m)) resolves to -1500000 -> -1.5
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), -1.0),
      (1L, ts("2024-01-01 02:00:00"), -2.000001),
      (2L, ts("2024-01-01 00:00:00"), -4.0),
      (2L, ts("2024-01-01 03:00:00"), 2.0) // crosses zero: -2, 0
    ).toDF("user_id", "ts", "value")
    val out = TimeSeries.interpolate(events, "user_id", "ts", "value", 3600L)
      .filter("n_events = 0").orderBy("user_id", "bucket").collect()
      .map(r => (r.getLong(0), r.getDouble(4)))
    assert(out.toList == List((1L, -1.5), (2L, -2.0), (2L, 0.0)))
  }

  test("gapFill grid is bounded by each key's own span, not the global one") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (2L, ts("2024-06-01 00:00:00"), 2.0) // months apart
    ).toDF("user_id", "ts", "value")
    val out = TimeSeries.gapFill(events, "user_id", "ts", "value", 3600L)
    // one bucket per user: a global grid would emit thousands of rows
    assert(out.count() == 2L)
  }

  test("rateAnomaly zero-fills the grid and z-scores with exact moments") {
    // key "a": hourly counts [3, 0, 3] (hour 1 has NO events — the zero
    // must enter the moments): mean 2, pop var (3·18 − 36)/9 = 2, so
    // z(0) = −2/√2 = −√2 — only the silent hour crosses |z| ≥ 1.
    val events = Seq(
      ("a", ts("2024-01-01 00:10:00")), ("a", ts("2024-01-01 00:20:00")),
      ("a", ts("2024-01-01 00:59:59")),
      ("a", ts("2024-01-01 02:10:00")), ("a", ts("2024-01-01 02:20:00")),
      ("a", ts("2024-01-01 02:30:00")),
      ("b", ts("2024-01-01 00:00:00")) // constant rate: zero variance, no rows
    ).toDF("event_type", "ts")
    val out = TimeSeries.rateAnomaly(events, "event_type", "ts", 3600L, 1.0)
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toList ==
      List(("a", ts("2024-01-01 01:00:00"), 0L, -1.414214)))
  }

  test("cusumChangePoints matches the textbook recursion on a shifted series") {
    // counts per minute for one key: [3,3,3,9,9,0,9] with drift k=3.
    // Recursion s_i = max(0, s_{i-1} + x_i - 3): [0,0,0,6,12,9,15]
    // threshold 10 flags minutes 4 (s=12) and 6 (s=15).
    val events = (Seq.fill(3)(0) ++ Seq.fill(3)(1) ++ Seq.fill(3)(2) ++
      Seq.fill(9)(3) ++ Seq.fill(9)(4) ++ Seq.fill(0)(5) ++ Seq.fill(9)(6))
      .zipWithIndex.map { case (minute, i) =>
        ("k", ts(f"2024-01-01 00:$minute%02d:00"), i.toLong) }
      .toDF("key", "ts", "event_id")
    val out = TimeSeries.cusumChangePoints(events, "key", "ts",
        bucketSeconds = 60L, driftK = 3L, threshold = 10L)
      .orderBy("bucket_epoch").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val base = ts("2024-01-01 00:00:00").getTime / 1000
    assert(out.toList == List((base + 240, 9L, 12L), (base + 360, 9L, 15L)))
  }

  test("rateAutocorr: perfect alternation gives r = -1, constants give null") {
    // key "a": minute counts [2,1,2,1,2] -> lag-1 pairs perfectly
    // anti-correlated -> r = -1. key "b": constant -> zero variance -> null.
    val mk = (k: String, minuteCounts: Seq[Int]) =>
      minuteCounts.zipWithIndex.flatMap { case (n, m) =>
        Seq.fill(n)((k, ts(f"2024-01-01 00:$m%02d:30"))) }
    val events = (mk("a", Seq(2, 1, 2, 1, 2)) ++ mk("b", Seq(3, 3, 3)))
      .toDF("key", "ts")
    val out = TimeSeries.rateAutocorr(events, "key", "ts", bucketSeconds = 60L)
      .orderBy("key").collect()
    assert(out(0).getLong(1) == 4L && out(0).getDouble(2) == -1.0)
    assert(out(1).getLong(1) == 2L && out(1).isNullAt(2))
  }

  test("rollingSum windows by TIME, not row position; ties share a frame") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-01 00:00:30"), 2.0),  // 30s later: in 60s window
      (1L, ts("2024-01-01 00:02:00"), 4.0),  // 90s after prev: alone
      (2L, ts("2024-01-01 00:00:00"), 8.0),
      (2L, ts("2024-01-01 00:00:00"), 16.0)  // same second: shared frame
    ).toDF("user_id", "ts", "value")
    val out = TimeSeries.rollingSum(events, "user_id", "ts", "value",
        windowSeconds = 60L)
      .orderBy("user_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
    assert(out.toList == List(
      (1L, 1L, 1.0), (1L, 2L, 3.0), (1L, 1L, 4.0),
      (2L, 2L, 24.0), (2L, 2L, 24.0)))
  }

  test("decayedSum halves per elapsed half-life from the anchor, exactly") {
    val events = Seq(
      (1L, ts("2024-01-31 12:00:00"), 8.0), // age < 1 week  -> 8/1
      (1L, ts("2024-01-20 00:00:00"), 8.0), // 1 half-life   -> 8/2
      (1L, ts("2024-01-10 00:00:00"), 8.0), // 3 half-lives  -> 8/8
      (2L, ts("2024-02-05 00:00:00"), 4.0)  // AFTER anchor: clamps to 4/1
    ).toDF("user_id", "ts", "value")
    val out = TimeSeries.decayedSum(events, "user_id", "ts", "value",
        anchor = "2024-02-01 00:00:00", halfLifeSeconds = 604800L)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toList == List((1L, 3L, 13.0), (2L, 1L, 4.0)))
  }

  test("seasonalProfile: exact bucket means, 0=Sunday dow, global gap") {
    import org.apache.spark.sql.functions.col
    // 2024-01-07 is a Sunday → dow 0
    val events = Seq(
      (ts("2024-01-07 05:10:00"), 1.5),
      (ts("2024-01-07 05:50:00"), 2.5),
      (ts("2024-01-08 13:00:00"), 4.0)
    ).toDF("ts", "value")
    val rows = TimeSeries.seasonalProfile(events, col("ts"), col("value"))
      .orderBy("dow", "hour").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    // global mean = 8/3 = 2.666667
    assert(rows.toList == List(
      (0, 5, 2L, 2.0, -0.666667),
      (1, 13, 1L, 4.0, 1.333333)))
  }

  test("seasonalAnomalies: pooled-variance z, top-k order, constant NULL") {
    import org.apache.spark.sql.functions.col
    // bucket A (Sun 05): values 1,3 → mean 2; bucket B (Mon 13): 8
    // global: n=3, mean=4, pop var = ((1-4)²+(3-4)²+(8-4)²)/3 = 26/3
    val events = Seq(
      (ts("2024-01-07 05:10:00"), 1.0),
      (ts("2024-01-07 05:50:00"), 3.0),
      (ts("2024-01-08 13:00:00"), 8.0)
    ).toDF("ts", "value")
    val rows = TimeSeries.seasonalAnomalies(events, col("ts"), col("value"),
        k = 2).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    val v = 26.0 / 3.0 // (n·Σq²−(Σq)²)/n² = (3·74−144)/9 = 78/9
    def z(mean: Double, n: Long) = BigDecimal((mean - 4.0) /
      math.sqrt(v / n)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    // |z_B| = 4/√(26/3) > |z_A| = 2/√(26/6) → B first
    assert(rows(0)._1 == 1 && rows(0)._2 == 13 && rows(0)._3 == 1L)
    assert(rows(0)._5 == z(8.0, 1))
    assert(rows(1)._1 == 0 && rows(1)._2 == 5 && rows(1)._5 == z(2.0, 2))
    // constant corpus → zero variance → NULL z, no crash
    val const = Seq((ts("2024-01-07 05:00:00"), 2.0),
      (ts("2024-01-08 06:00:00"), 2.0)).toDF("ts", "value")
    assert(TimeSeries.seasonalAnomalies(const, col("ts"), col("value"), 2)
      .collect().forall(_.isNullAt(4)))
  }

  test("kaplanMeier: textbook survival walk with censoring") {
    import org.apache.spark.sql.functions.col
    // durations (1,evt) (2,cens) (3,evt) (3,evt) (4,cens):
    // S(1)=4/5=0.8, S(2)=0.8 (censor only), S(3)=0.8·(1/3), S(4) flat
    val df = Seq((1.0, 1), (2.0, 0), (3.0, 1), (3.0, 1), (4.0, 0))
      .toDF("d", "e")
    val rows = TimeSeries.kaplanMeier(df, col("d"), col("e"))
      .orderBy("duration").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.toList == List(
      (1.0, 5L, 1L, 0L, 0.8),
      (2.0, 4L, 0L, 1L, 0.8),
      (3.0, 3L, 2L, 0L, 0.266667),
      (4.0, 1L, 0L, 1L, 0.266667)))
    // everyone-dies step zeroes the curve exactly (ln 0 spelled as −∞)
    val wipe = Seq((1.0, 1), (2.0, 1), (2.0, 1)).toDF("d", "e")
    val s = TimeSeries.kaplanMeier(wipe, col("d"), col("e"))
      .orderBy("duration").collect().map(_.getDouble(4))
    assert(s.toList == List(0.666667, 0.0))
    // NULL durations are excluded, not grouped
    val withNull = Seq((Some(1.0), 1), (None, 1)).toDF("d", "e")
    assert(TimeSeries.kaplanMeier(withNull, col("d"), col("e"))
      .count() == 1)
  }

  test("theilSen: median pairwise slope, even-count mean, guards") {
    import org.apache.spark.sql.functions.col
    // key a slopes {1,2,3} → median 2; key b slopes
    // {2,1,1,0,0.5,1} sorted {0,0.5,1,1,1,2} → mean of middles = 1
    val pts = Seq(
      ("a", 0.0, 0.0), ("a", 1.0, 1.0), ("a", 2.0, 4.0),
      ("b", 0.0, 0.0), ("b", 1.0, 2.0), ("b", 2.0, 2.0), ("b", 3.0, 3.0),
      ("c", 5.0, 5.0) // single point: no pairs, drops out
    ).toDF("k", "x", "y")
    val rows = TimeSeries.theilSen(pts, "k", col("x"), col("y"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toList == List(("a", 3L, 3L, 2.0), ("b", 4L, 6L, 1.0)))
    // maxPoints fail-fast names the offending key
    val ex = intercept[Exception] {
      TimeSeries.theilSen(pts, "k", col("x"), col("y"), maxPoints = 2L)
        .collect()
    }
    assert(ex.getMessage.contains("maxPoints") ||
      Option(ex.getCause).exists(_.getMessage.contains("maxPoints")))
  }

  test("decayedSum clamps huge ages to 2^60 instead of overflowing") {
    val events = Seq((1L, ts("1970-01-02 00:00:00"), 1000000.0))
      .toDF("user_id", "ts", "value")
    val out = TimeSeries.decayedSum(events, "user_id", "ts", "value",
        anchor = "2024-02-01 00:00:00", halfLifeSeconds = 3600L)
      .collect().map(r => r.getDouble(2))
    assert(out.toList == List(0.0)) // decayed below any 6-decimal quantum
  }

  test("rollingMedian: trailing window, partial head, exact halves") {
    import spark.implicits._
    val s = Seq(("k", 1, 5.0), ("k", 2, 1.0), ("k", 3, 4.0),
      ("k", 4, 2.0), ("k", 5, 3.0)).toDF("key", "t", "v")
    val out = TimeSeries.rollingMedian(s, "key", "t", "v", window = 3)
      .orderBy("t").collect().map(_.getDouble(3))
    assert(out.toList == List(5.0, 3.0, 4.0, 2.0, 3.0))
  }

  test("permutationEntropy: ordinal patterns with stable ties") {
    import spark.implicits._
    val e = Seq(("k", 1L, 1L, 1.0), ("k", 2L, 2L, 2.0), ("k", 3L, 3L, 3.0),
      ("k", 4L, 4L, 2.0), ("k", 5L, 5L, 1.0)).toDF("key", "ts", "id", "v")
    val r = TimeSeries.permutationEntropy(e, "key", "ts", "id", col("v"))
      .collect().head
    // triples: (1,2,3)->123, (2,3,2)->132 (tie keeps position), (3,2,1)->321
    assert(r.getLong(1) == 3 && r.getLong(2) == 3)
    val h = math.log(3.0) / math.log(2.0)
    assert(r.getDouble(3) ==
      BigDecimal(h).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // constant series: stable ties -> single "123" pattern, entropy 0
    val c = Seq(("k", 1L, 1L, 7.0), ("k", 2L, 2L, 7.0), ("k", 3L, 3L, 7.0))
      .toDF("key", "ts", "id", "v")
    val rc = TimeSeries.permutationEntropy(c, "key", "ts", "id", col("v"))
      .collect().head
    assert(rc.getLong(2) == 1 && rc.getDouble(3) == 0.0)
  }

  test("crossCorrelation: perfect lead/lag correlation, overlap windows") {
    import spark.implicits._
    val a = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("day", "n")
    val b = Seq((1L, 2.0), (2L, 4.0), (3L, 6.0)).toDF("day", "n")
    val out = TimeSeries.crossCorrelation(a, b, "day", "n", maxLag = 3)
      .orderBy("lag").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    // lags beyond overlap vanish (inner join); +-2 leave one pair (var 0)
    assert(out.map(_._1).toList == List(-2L, -1L, 0L, 1L, 2L))
    assert(out.find(_._1 == 0L).get == ((0L, 3L, Some(1.0))))
    assert(out.find(_._1 == 1L).get == ((1L, 2L, Some(1.0))))
    assert(out.find(_._1 == -1L).get == ((-1L, 2L, Some(1.0))))
    assert(out.find(_._1 == 2L).get._3.isEmpty)  // single pair: no variance
    // anti-correlated at lag 0
    val c = Seq((1L, 3.0), (2L, 2.0), (3L, 1.0)).toDF("day", "n")
    val anti = TimeSeries.crossCorrelation(a, c, "day", "n", maxLag = 0)
      .collect().head
    assert(anti.getDouble(2) == -1.0)
  }

  test("olsTrend: exact fit, hand DW, degenerate guards") {
    import spark.implicits._
    // perfect line y = 2x + 1: slope 2, r2 1, residuals 0 -> dw NULL
    val line = Seq(("a", 1L, 3L), ("a", 2L, 5L), ("a", 3L, 7L))
      .toDF("g", "x", "y")
    val r = TimeSeries.olsTrend(line, "g", "x", "y").collect().head
    assert(r.getLong(1) == 3 && r.getDouble(2) == 2.0 &&
      r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0 && r.isNullAt(5))
    // y = [0, 1, 0, 1] on x = 1..4: slope from moments, residuals
    // alternate -> strong negative autocorrelation (dw > 2)
    val alt = Seq(("b", 1L, 0L), ("b", 2L, 1L), ("b", 3L, 0L),
      ("b", 4L, 1L)).toDF("g", "x", "y")
    val ra = TimeSeries.olsTrend(alt, "g", "x", "y").collect().head
    val b = (4.0 * 6 - 10 * 2) / (4.0 * 30 - 100)
    val a0 = (2.0 - b * 10.0) / 4.0
    val e = Seq(1, 2, 3, 4).map(x => ((x + 1) % 2).toDouble - (a0 + b * x))
    val dw = e.sliding(2).map { case Seq(p, c) => (c - p) * (c - p) }.sum /
      e.map(v => v * v).sum
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(ra.getDouble(2) == r6(b) && ra.getDouble(5) == r6(dw))
    assert(ra.getDouble(5) > 2.0)
    // single bucket: var(x) = 0 -> everything but n NULL
    val one = Seq(("c", 5L, 9L)).toDF("g", "x", "y")
    val ro = TimeSeries.olsTrend(one, "g", "x", "y").collect().head
    assert(ro.getLong(1) == 1 && ro.isNullAt(2) && ro.isNullAt(3) &&
      ro.isNullAt(4) && ro.isNullAt(5))
  }

  test("runsTest: alternating vs blocked sequences; median drops") {
    import spark.implicits._
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // values 1,9,1,9,1,9 -> median 5, signs 0,1,0,1,0,1 -> 6 runs
    val alt = Seq((1L, 1L), (2L, 9L), (3L, 1L), (4L, 9L), (5L, 1L),
      (6L, 9L)).toDF("o", "v")
    val r = TimeSeries.runsTest(alt, "o", "v").collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 3 && r.getLong(2) == 6)
    val mu = 2.0 * 3 * 3 / 6.0 + 1.0
    val s2 = (mu - 1.0) * (mu - 2.0) / 5.0
    assert(r.getDouble(3) == 4.0)
    assert(r.getDouble(4) == r6((6.0 - mu) / math.sqrt(s2)))
    // blocked 1,1,1,9,9,9 -> 2 runs, z negative
    val blk = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 9L), (5L, 9L),
      (6L, 9L)).toDF("o", "v")
    val rb = TimeSeries.runsTest(blk, "o", "v").collect().head
    assert(rb.getLong(2) == 2 && rb.getDouble(4) < 0.0)
    // median values drop: 1,5,9 -> median 5 dropped, one above one below
    val med = Seq((1L, 1L), (2L, 5L), (3L, 9L)).toDF("o", "v")
    val rm = TimeSeries.runsTest(med, "o", "v").collect().head
    assert(rm.getLong(0) == 1 && rm.getLong(1) == 1 && rm.getLong(2) == 2)
    // one-sided series (all above-median dropped to empty side) -> z NULL
    val const = Seq((1L, 7L), (2L, 7L)).toDF("o", "v")
    val rc = TimeSeries.runsTest(const, "o", "v").collect().head
    assert(rc.isNullAt(3) && rc.isNullAt(4))
  }

  test("mannKendall: monotone series, ties, constant series") {
    import spark.implicits._
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // strictly increasing: S = n(n-1)/2 = 10, no ties
    val up = (1 to 5).map(i => (i.toLong, i.toLong * 10)).toDF("o", "v")
    val r = TimeSeries.mannKendall(up, "o", "v").collect().head
    assert(r.getLong(0) == 5 && r.getLong(1) == 10 && r.getLong(2) == 10)
    val varS = 5.0 * 4.0 * 15.0 / 18.0
    assert(r.getDouble(3) == r6((10.0 - 1.0) / math.sqrt(varS)))
    // decreasing -> S negative, z symmetric
    val dn = (1 to 5).map(i => (i.toLong, 100L - i * 10)).toDF("o", "v")
    val rd = TimeSeries.mannKendall(dn, "o", "v").collect().head
    assert(rd.getLong(2) == -10 && rd.getDouble(3) == -r.getDouble(3))
    // ties reduce the variance: [1, 2, 2, 3] has one t=2 run
    val t = Seq((1L, 1L), (2L, 2L), (3L, 2L), (4L, 3L)).toDF("o", "v")
    val rt = TimeSeries.mannKendall(t, "o", "v").collect().head
    // S = 5 (all up pairs except the tie); var = (4*3*13 - 2*1*9)/18
    assert(rt.getLong(2) == 5)
    assert(rt.getDouble(3) == r6(4.0 / math.sqrt((156.0 - 18.0) / 18.0)))
    // constant series: varS = 0 -> z NULL
    val c = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("o", "v")
    assert(TimeSeries.mannKendall(c, "o", "v").collect().head.isNullAt(3))
    // maxPoints fail-fast: the bucketed-frame contract is ENFORCED —
    // raw rows past the cap must raise, not run a silent n² self-join
    val big = (1 to 20).map(i => (i.toLong, i.toLong)).toDF("o", "v")
    val ex = intercept[Exception] {
      TimeSeries.mannKendall(big, "o", "v", maxPoints = 10L).collect()
    }
    assert(ex.getMessage.contains("mannKendall") ||
      Option(ex.getCause).exists(_.getMessage.contains("mannKendall")))
  }
}
