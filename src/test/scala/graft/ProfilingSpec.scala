package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profiling

class ProfilingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kminDistinct: bounded sorted array, exact under k, partition-independent") {
    // 0..499 as strings, each duplicated 3×, across 8 partitions — the
    // merge path runs, duplicates must not double-count, and the result
    // must equal the single-partition run bit-for-bit.
    val vals = (0 until 500).flatMap(i => Seq.fill(3)(f"v$i%04d"))
    def run(parts: Int): Seq[Seq[String]] =
      spark.createDataset(vals).repartition(parts)
        .agg(Profiling.kminDistinct(col("value"), 16).as("m"))
        .collect().map(_.getSeq[String](0)).toSeq
    val one = run(1)
    assert(run(8) == one)
    val arr = one.head
    assert(arr.size == 16 && arr == arr.sorted && arr.distinct.size == 16)
    assert(arr == vals.distinct.sorted.take(16))
    // under k distinct: exact, shorter array
    val small = spark.createDataset(Seq("b", "a", "b", "a", "c"))
      .agg(Profiling.kminDistinct(col("value"), 16))
      .collect().head.getSeq[String](0)
    assert(small == Seq("a", "b", "c"))
  }

  test("kmv estimate: within ~4 standard errors of the true cardinality") {
    val k = 256
    val n = 20000
    val est = spark.range(n)
      .agg(Profiling.kminDistinct(md5(col("id").cast("string")), k).as("m"))
      .select(Profiling.kmvEstimate(col("m"), k))
      .collect().head.getDouble(0)
    // relative error ≈ 1/sqrt(k-2) ≈ 6.3%; 4σ envelope
    assert(math.abs(est - n) / n < 0.25, s"estimate $est too far from $n")
  }

  test("approxDistinct: per-group rows, sketch size, exact small groups") {
    val df = spark.range(3000)
      .select((col("id") % 3).as("g"),
        // group 0: 1000 distinct; group 1: 10 distinct; group 2: 1 distinct
        when(col("id") % 3 === 0, col("id"))
          .when(col("id") % 3 === 1, col("id") % 30)
          .otherwise(lit(42)).cast("string").as("v"))
    val out = Profiling.approxDistinct(df, Seq("g"), col("v"), k = 64)
      .orderBy("g").collect()
    assert(out.length == 3)
    assert(out.map(_.getLong(1)).toSeq == Seq(1000L, 1000L, 1000L)) // n_rows
    // group 1 and 2 are below k: exact counts
    assert(out(1).getDouble(3) == 10.0 && out(1).getLong(2) == 10L)
    assert(out(2).getDouble(3) == 1.0)
    // group 0: estimated, sketch capped at k. The estimate is
    // deterministic, so pin it exactly: this fixed hash draw happens to
    // sit ~4σ high (true 1000; k=64 ⇒ σ≈13%) — independently reproduced
    // with Python's hashlib over the same strings, which also validates
    // the estimator's off-by-one (k-1 over the k-th minimum).
    assert(out(0).getLong(2) == 64L)
    assert(out(0).getDouble(3) == 1531.9271)
  }

  test("overlapEstimate: known 1/3 Jaccard recovered; exact below k") {
    val a = spark.range(0, 1000).select(col("id"))
    val b = spark.range(500, 1500).select(col("id"))
    val r = Profiling.overlapEstimate(a, col("id"), b, col("id"), k = 128)
      .collect().head
    // true: |A|=|B|=1000, |A∪B|=1500, J=1/3, |A∩B|=500. k=128 ⇒ σ≈9%
    // per estimate; Jaccard σ ≈ sqrt(J(1-J)/k) ≈ 4pp. Generous 4σ bounds.
    assert(math.abs(r.getDouble(0) - 1000) < 350, s"est_left ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1) - 1000) < 350)
    assert(math.abs(r.getDouble(2) - 1500) < 500)
    assert(math.abs(r.getDouble(3) - 0.3333) < 0.17, s"jaccard ${r.getDouble(3)}")
    assert(math.abs(r.getDouble(4) - 500) < 350, s"est_intersect ${r.getDouble(4)}")
    // both sides under k: everything exact
    val sa = spark.range(0, 50).select(col("id"))
    val sb = spark.range(30, 80).select(col("id"))
    val e = Profiling.overlapEstimate(sa, col("id"), sb, col("id"), k = 128)
      .collect().head
    assert(e.getDouble(0) == 50.0 && e.getDouble(1) == 50.0 && e.getDouble(2) == 80.0)
    assert(e.getDouble(3) == 0.25 && e.getDouble(4) == 20.0)
  }

  test("driftPsi: identical snapshots ~0; a hard shift scores large; bins equal-population") {
    val ref = spark.range(1000).select((col("id") % 100).cast("double").as("v"))
    val same = Profiling.driftPsi(ref, ref, "v", bins = 10)
      .agg(sum(col("psi_term"))).collect().head.getDouble(0)
    assert(math.abs(same) < 1e-9, s"identical snapshots scored $same")
    val bins = Profiling.driftPsi(ref, ref, "v", bins = 10)
      .select("n_ref").collect().map(_.getLong(0))
    assert(bins.forall(_ == 100L), s"reference bins not equal-population: ${bins.toList}")
    // shift: everything lands in the top reference bin
    val shifted = spark.range(1000).select((col("id") % 100 + 1000).cast("double").as("v"))
    val psi = Profiling.driftPsi(ref, shifted, "v", bins = 10)
      .agg(sum(col("psi_term"))).collect().head.getDouble(0)
    assert(psi > 1.0, s"hard shift scored only $psi")
  }

  test("heavyHitters: exact counts above threshold, bounded-state candidates, null keys ignored") {
    // Zipf-ish: key i (0..9) appears 1000-100*i times (heavy head),
    // plus 5000 singleton keys (the long tail that must never shuffle
    // whole through the exact path) and some nulls.
    val head = (0 until 10).flatMap(i => Seq.fill(1000 - 100 * i)(s"h$i"))
    val tail = (0 until 5000).map(i => s"t$i")
    val nulls = Seq.fill(37)(null: String)
    val rng = new scala.util.Random(42)
    val df = spark.createDataset(rng.shuffle(
      (head ++ tail ++ nulls).toList))
      .repartition(8).toDF("k")
    val n = head.size + tail.size // non-null rows = 5500 + 5000 = 10500
    // threshold 3% of 10500 = 315 rows: h0..h6 qualify (1000..400), h7
    // (300) and below do not
    val got = Profiling.heavyHitters(df, col("k"), minSharePpm = 30000L)
      .orderBy(desc("n_rows")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = (0 until 10).map(i => (s"h$i", (1000 - 100 * i).toLong))
      .filter { case (_, c) => c * 1000000L >= n.toLong * 30000L }
      .map { case (key, c) =>
        (key, c, BigDecimal(c.toDouble / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    assert(got == want, s"got $got")
    // partition-count invariance: the exact confirm pass erases the
    // sketch's stream-order noise
    val got1 = Profiling.heavyHitters(df.repartition(1), col("k"), 30000L)
      .orderBy(desc("n_rows")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got1 == got)
  }

  test("heavyHitters: boundary count exactly at threshold is kept; ppm bounds enforced") {
    // 100 non-null rows, 5% threshold = exactly 5 rows: "edge" has 5
    val df = (Seq.fill(5)("edge") ++ Seq.fill(4)("below") ++
      (0 until 91).map(i => s"u$i")).toDF("k")
    val got = Profiling.heavyHitters(df, col("k"), minSharePpm = 50000L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("edge", 5L)))
    intercept[IllegalArgumentException] {
      Profiling.heavyHitters(df, col("k"), minSharePpm = 99L)
    }
  }

  test("profile: nulls, negatives, all-null column, string lengths, timestamp micros") {
    val df = Seq(
      (Some(-10L), Some("aa"), Some(Timestamp.valueOf("2024-01-01 00:00:00.000001")), None: Option[Double]),
      (Some(5L), Some(""), Some(Timestamp.valueOf("2024-01-01 00:00:00.000003")), None),
      (None, Some("abcd"), None, None),
      (Some(-1L), None, None, None))
      .toDF("n", "s", "t", "z")
    val out = Profiling.profile(df, Seq("n", "s", "t", "z"), k = 8)
      .orderBy("column").collect()
      .map(r => r.getString(0) -> r).toMap
    val n = out("n")
    assert(n.getLong(1) == 4 && n.getLong(2) == 1)        // n_rows, n_null
    assert(n.getDouble(3) == 3.0)                          // exact distinct under k
    assert(n.getDouble(4) == -10.0 && n.getDouble(5) == 5.0)
    // mean of (-10, 5, -1) = -2.0 exactly
    assert(n.getDouble(6) == -2.0)
    assert(n.isNullAt(7) && n.isNullAt(8))
    val s = out("s")
    assert(s.getLong(2) == 1 && s.getDouble(3) == 3.0)
    assert(s.isNullAt(4) && s.isNullAt(5) && s.isNullAt(6))
    assert(s.getLong(7) == 0 && s.getLong(8) == 4)         // min/max length
    val t = out("t")
    assert(t.getLong(2) == 2 && t.getDouble(3) == 2.0)
    assert(t.getDouble(5) - t.getDouble(4) == 2.0)         // micros preserved
    assert(t.getDouble(6) == t.getDouble(4) + 1.0)         // half-up micro mean
    val z = out("z")
    assert(z.getLong(2) == 4 && z.getDouble(3) == 0.0)
    assert(z.isNullAt(4) && z.isNullAt(5) && z.isNullAt(6))
  }

  test("profile: large-magnitude longs and doubles don't null-overflow (r8 advice)") {
    // Epoch-micros-sized longs (~1.7e15) and >1e12 doubles overflowed the
    // old DECIMAL(18,6) quantization to null: rows silently vanished from
    // the mean's sum (but not its denominator) and from the sketch.
    val df = Seq(
      (1700000000000001L, 2.5e13),
      (1700000000000003L, 2.5e13 + 0.25),
      (1700000000000005L, -3.0e12))
      .toDF("big", "dbl")
    val out = Profiling.profile(df, Seq("big", "dbl"), k = 8)
      .orderBy("column").collect().map(r => r.getString(0) -> r).toMap
    val b = out("big")
    assert(b.getLong(1) == 3 && b.getLong(2) == 0)
    assert(b.getDouble(3) == 3.0)                       // sketch saw all rows
    assert(b.getDouble(4) == 1700000000000001.0 && b.getDouble(5) == 1700000000000005.0)
    // the integer mean is exact in decimal; the final ×1e6-scaled value
    // sits past 2^53, so the one double conversion carries IEEE nearest
    // rounding (deterministic, both engines round the same exact integer)
    assert(math.abs(b.getDouble(6) - 1700000000000003.0) < 1.0)
    val d = out("dbl")
    assert(d.getDouble(3) == 3.0)
    // mean = (2.5e13 + (2.5e13+0.25) - 3.0e12)/3 quantized at 1e-6:
    // scaled = 47000000000000250000/3 = 15666666666666750000 exactly
    assert(math.abs(d.getDouble(6) - 1.566666666666675e13) < 1.0)
  }

  test("profileDiff: planted null/distinct/mean drift lands in the right columns") {
    val ref = spark.range(1000)
      .select(col("id").as("a"), (col("id") % 100).cast("double").as("b"),
        concat(lit("s"), col("id") % 50).as("s"))
    val cur = spark.range(1000)
      .select(col("id").as("a"),
        // mean 49.5 -> 50.0 (+0.5), and distinct collapses 100 -> 10
        ((col("id") % 10) * 10 + 5).cast("double").as("b"),
        // 10% of s nulled
        when(col("id") % 10 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("s"), col("id") % 50)).as("s"))
    val out = Profiling.profileDiff(ref, cur, Seq("a", "b", "s"), k = 64)
      .orderBy("column").collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) == 1000 && a.getLong(2) == 1000)
    assert(a.getDouble(3) == 0.0)                     // null_delta
    assert(a.getDouble(5) == 0.0)                     // mean_shift
    val b = out("b")
    assert(b.getDouble(5) == 0.5, s"mean_shift ${b.getDouble(5)}")
    assert(b.getDouble(4) < 0.5,                      // distinct_ratio collapse
      s"distinct_ratio ${b.getDouble(4)}")
    val s = out("s")
    assert(s.getDouble(3) == 0.1, s"null_delta ${s.getDouble(3)}")
    assert(s.isNullAt(5))                             // no mean for strings
  }

  test("profileBy: per-group rows match per-group profile() runs") {
    val df = Seq(("a", 1L, "xx"), ("a", 2L, "y"), ("b", 10L, null))
      .toDF("g", "n", "s")
    val grouped = Profiling.profileBy(df, Seq("g"), Seq("n", "s"), k = 8)
      .orderBy("g", "column").collect().map(_.toString).toSeq
    val manual = Seq("a", "b").flatMap { g =>
      Profiling.profile(df.filter(col("g") === g), Seq("n", "s"), k = 8)
        .withColumn("g", lit(g))
        .select("g", "column", "n_rows", "n_null", "approx_distinct",
          "min_val", "max_val", "mean_val", "min_len", "max_len")
        .orderBy("column").collect().map(_.toString)
    }
    assert(grouped == manual)
  }

  test("profileBy: maxGroups guard fires on high-cardinality stratification") {
    val df = spark.range(100)
      .select(col("id").cast("string").as("g"), col("id").as("v"))
    val e = intercept[IllegalArgumentException] {
      Profiling.profileBy(df, Seq("g"), Seq("v"), k = 8, maxGroups = 10L)
    }
    assert(e.getMessage.contains("maxGroups=10"))
    assert(e.getMessage.contains("bytes/group"))
    // maxGroups=0 skips the pre-pass entirely
    assert(Profiling.profileBy(df, Seq("g"), Seq("v"), k = 8, maxGroups = 0L)
      .count() == 100)
  }

  test("profile rejects unsupported column types") {
    val df = Seq((1, Seq(1, 2))).toDF("a", "arr")
    intercept[IllegalArgumentException] {
      Profiling.profile(df, Seq("arr"))
    }
  }

  test("contingencyChi2: hand-computed 2x2 terms and zero-filled spine") {
    // 2x2: rows a=30 b=70, cols x=40 y=60, n=100
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(30)(("b", "x")) ++ Seq.fill(40)(("b", "y"))
    val got = Profiling.contingencyChi2(rows.toDF("r", "c"), "r", "c")
      .orderBy("r", "c").collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2),
        x.getDouble(3), x.getDouble(4)))
    assert(got(0) == (("a", "x", 10L, 12.0, round6(4.0 / 12))))
    assert(got(1) == (("a", "y", 20L, 18.0, round6(4.0 / 18))))
    assert(got(2) == (("b", "x", 30L, 28.0, round6(4.0 / 28))))
    assert(got(3) == (("b", "y", 40L, 42.0, round6(4.0 / 42))))
    // a category seen only in one column still yields the full spine:
    // cell (c, x) is zero-filled and its term equals its expected count
    val spined = Profiling.contingencyChi2(
      (rows ++ Seq.fill(5)(("c", "y"))).toDF("r", "c"), "r", "c")
      .orderBy("r", "c").collect()
    assert(spined.length == 6)
    val cx = spined.find(x => x.getString(0) == "c" && x.getString(1) == "x").get
    assert(cx.getLong(2) == 0L && cx.getDouble(4) == cx.getDouble(3))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("winsorizedStats: exact fences, trimmed vs winsorized, alpha=0") {
    val vals = Seq(0.0, 1.0, 1.0, 2.0, 3.0, 5.0, 8.0, 13.0, 21.0, 1000.0)
    val df = vals.map(("g", _)).toDF("g", "v")
    val r = Profiling.winsorizedStats(df, "g", col("v"), alpha = 0.1)
      .collect().head
    // n=10, k=1: fences at ranks 2 and 9 -> 1 and 21
    assert(r.getLong(1) == 10 && r.getLong(2) == 1)
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 21.0)
    // mid ranks 2..9 sum 54 -> trimmed 6.75; winsor (54+1+21)/10 = 7.6
    assert(r.getDouble(5) == 6.75 && r.getDouble(6) == 7.6)
    // alpha = 0: both collapse to the exact mean
    val r0 = Profiling.winsorizedStats(df, "g", col("v"), alpha = 0.0)
      .collect().head
    val mean = BigDecimal(vals.sum / 10)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r0.getLong(2) == 0 && r0.getDouble(5) == mean &&
      r0.getDouble(6) == mean)
    intercept[IllegalArgumentException] {
      Profiling.winsorizedStats(df, "g", col("v"), alpha = 0.5)
    }
  }

  test("benfordAudit: exact digit extraction, zero-filled spine, exclusions") {
    val df = Seq(1.00, 1.23, 2.50, 9.99, 0.0, -3.0).toDF("v")
    val rows = Profiling.benfordAudit(df, col("v")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 9)
    val byDigit = rows.map(t => t._1 -> t).toMap
    assert(byDigit(1)._2 == 2 && byDigit(1)._3 == 0.5)
    assert(byDigit(2)._2 == 1 && byDigit(9)._2 == 1)
    assert((3 to 8).forall(d => byDigit(d)._2 == 0L))
    // benford expectation of digit 1 = ln2/ln10
    val b1 = Profiling.benfordAudit(df, col("v")).collect()
      .find(_.getInt(0) == 1).get.getDouble(3)
    assert(b1 == BigDecimal(math.log(2.0) / math.log(10.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("subsampleCI: envelope brackets the mean, deterministic, tiny-input NULL") {
    val df = (1L to 200L).map(i => (i, (i % 17).toDouble)).toDF("id", "v")
    val r = Profiling.subsampleCI(df, col("id"), col("v"), nResamples = 8)
      .collect().head
    assert(r.getInt(0) == 8 && r.getLong(1) == 200)
    val (full, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(lo <= full && full <= hi)
    // pure hash membership → byte-identical on re-run
    val r2 = Profiling.subsampleCI(df, col("id"), col("v"), nResamples = 8)
      .collect().head
    assert(r == r2)
    // single row: some hex digit is odd → an empty resample → NULL bounds
    val one = Seq((1L, 5.0)).toDF("id", "v")
    val t = Profiling.subsampleCI(one, col("id"), col("v"),
      nResamples = 32).collect().head
    assert(t.getDouble(2) == 5.0 && t.isNullAt(3) && t.isNullAt(4))
    intercept[IllegalArgumentException] {
      Profiling.subsampleCI(df, col("id"), col("v"), nResamples = 33)
    }
  }

  test("qqTable: exact rank cuts, constant gap on a shifted copy, empty side") {
    val a = (1 to 10).map(i => Tuple1(i.toDouble)).toDF("v")
    val b = (11 to 20).map(i => Tuple1(i.toDouble)).toDF("v")
    val rows = Profiling.qqTable(a, b, col("v"), quantiles = 4)
      .orderBy("quantile").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    // ranks ceil(10k/4) = 3, 5, 8
    assert(rows.toSeq == Seq((1, 3.0, 13.0, 10.0), (2, 5.0, 15.0, 10.0),
      (3, 8.0, 18.0, 10.0)))
    // empty side: cuts NULL, join still yields the spine
    val empty = Seq.empty[Tuple1[Double]].toDF("v")
    val e = Profiling.qqTable(a, empty, col("v"), quantiles = 4)
      .orderBy("quantile").collect()
    assert(e.length == 3 && e.forall(r => r.isNullAt(2) && r.isNullAt(3)))
    intercept[IllegalArgumentException] {
      Profiling.qqTable(a, b, col("v"), quantiles = 1)
    }
  }

  test("cramersV: perfect association 1, independence ~0, constant NULL") {
    // perfect: b = a; independent: b uniform within each a
    val df = Seq(
      ("x", "x", "p", "k"), ("x", "x", "q", "k"),
      ("y", "y", "p", "k"), ("y", "y", "q", "k")
    ).toDF("a", "dup", "ind", "const")
    val rows = Profiling.cramersV(df, Seq(
        ("perfect", col("a"), col("dup")),
        ("independent", col("a"), col("ind")),
        ("constant", col("a"), col("const"))))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("perfect").getDouble(5) == 1.0)
    assert(rows("independent").getDouble(5) == 0.0)
    assert(rows("independent").getDouble(4) == 0.0) // chi2 exactly 0
    assert(rows("constant").isNullAt(5)) // min(r,c) = 1 → undefined
    // chi2 includes the ABSENT-cell mass: a diagonal-only 2x2 has
    // chi2 = n (observed terms n/2·2... spine mass counted)
    assert(rows("perfect").getDouble(4) == 4.0)
    intercept[IllegalArgumentException] {
      Profiling.cramersV(df, Seq.empty)
    }
  }

  test("concentration: HHI and CR on a hand grid") {
    import spark.implicits._
    val df = Seq(("g", "a", 50.0), ("g", "b", 30.0), ("g", "c", 20.0))
      .toDF("grp", "e", "v")
    val r = Profiling.concentration(df, col("grp"), col("e"), col("v"),
      topN = 1).collect().head
    // shares 0.5/0.3/0.2 -> HHI = 3800; CR1 = 0.5
    assert(r.getLong(1) == 3)
    assert(r.getDouble(2) == 3800.0)
    assert(r.getDouble(3) == 0.5)
    // monopoly -> HHI 10000
    val m = Profiling.concentration(Seq(("g", "a", 9.0)).toDF("grp", "e", "v"),
      col("grp"), col("e"), col("v")).collect().head
    assert(m.getDouble(2) == 10000.0 && m.getDouble(3) == 1.0)
  }

  test("ebShrinkMeans: small group shrinks harder; degenerate guards") {
    import spark.implicits._
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // big group around 10 (n=4), small group around 20 (n=2)
    val df = Seq(("big", 9.0), ("big", 11.0), ("big", 9.0), ("big", 11.0),
      ("small", 19.0), ("small", 21.0)).toDF("g", "v")
    val out = Profiling.ebShrinkMeans(df, col("g"), col("v"))
      .orderBy("group").collect()
    val big = out(0); val small = out(1)
    assert(big.getLong(1) == 4 && small.getLong(1) == 2)
    assert(big.getDouble(2) == 10.0 && small.getDouble(2) == 20.0)
    // hand MoM (unscaled x100): N=6, k=2, ssw = 4+2=... compute directly
    val xs = Seq(900.0, 1100.0, 900.0, 1100.0)
    val ys = Seq(1900.0, 2100.0)
    val (nN, kk) = (6.0, 2.0)
    val s2w = (xs.map(v => v * v).sum - math.pow(xs.sum, 2) / 4 +
      ys.map(v => v * v).sum - math.pow(ys.sum, 2) / 2) / (nN - kk)
    val grand = (xs.sum + ys.sum) / nN
    val ssb = math.pow(xs.sum, 2) / 4 + math.pow(ys.sum, 2) / 2 -
      math.pow(xs.sum + ys.sum, 2) / nN
    val n0 = (nN - (16.0 + 4.0) / nN) / (kk - 1.0)
    val tau2 = math.max(0.0, (ssb / (kk - 1.0) - s2w) / n0)
    def bOf(n: Double) = tau2 / (tau2 + s2w / n)
    assert(big.getDouble(4) == r6(bOf(4.0)))
    assert(small.getDouble(4) == r6(bOf(2.0)))
    assert(small.getDouble(3) ==
      r6((grand + bOf(2.0) * (ys.sum / 2 - grand)) / 100.0))
    // the bigger group keeps more of its own mean
    assert(big.getDouble(4) > small.getDouble(4))
    // shrunk means stay between own mean and grand mean
    assert(small.getDouble(3) < 20.0 && small.getDouble(3) > grand / 100.0)
    // single group -> k < 2 -> shrunk/b NULL, mean kept
    val kOne = Profiling.ebShrinkMeans(
      Seq(("g", 1.0), ("g", 2.0)).toDF("g", "v"), col("g"), col("v"))
      .collect().head
    assert(kOne.getDouble(2) == 1.5 && kOne.isNullAt(3) && kOne.isNullAt(4))
    // all-constant data -> tau2 = s2w = 0 -> B = 0, shrunk = grand
    val const = Profiling.ebShrinkMeans(
      Seq(("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0)).toDF("g", "v"),
      col("g"), col("v")).orderBy("group").collect()
    assert(const.forall(r => r.getDouble(3) == 5.0 && r.getDouble(4) == 0.0))
  }
}
