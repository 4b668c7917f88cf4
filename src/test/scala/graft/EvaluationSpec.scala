package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Evaluation

class EvaluationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("aucBinary: hand-computed midrank AUC with ties, degenerate cases") {
    import spark.implicits._
    // ranks asc: 0.1→1, 0.2→2, {0.3,0.3}→midrank 3.5, 0.4→5
    // Σranks(pos) = 3.5 + 5 = 8.5; U = 8.5 − 2·3/2 = 5.5; AUC = 5.5/6
    val df = Seq((0.1, 0), (0.2, 0), (0.3, 1), (0.3, 0), (0.4, 1))
      .toDF("s", "y")
    val r = Evaluation.aucBinary(df, col("s"), col("y")).collect().head
    assert(r.getLong(0) == 5 && r.getLong(1) == 2 && r.getLong(2) == 3)
    assert(r.getLong(3) == 4) // distinct scores
    assert(r.getDouble(4) == round6(5.5 / 6.0)) // 0.916667 (6dp output)
    // perfect separation → 1.0; inverted → 0.0
    val perfect = Seq((0.1, 0), (0.2, 0), (0.9, 1)).toDF("s", "y")
    assert(Evaluation.aucBinary(perfect, col("s"), col("y"))
      .collect().head.getDouble(4) == 1.0)
    val inverted = Seq((0.9, 0), (0.8, 0), (0.1, 1)).toDF("s", "y")
    assert(Evaluation.aucBinary(inverted, col("s"), col("y"))
      .collect().head.getDouble(4) == 0.0)
    // single class → NULL, not 0.5
    val oneClass = Seq((0.1, 1), (0.2, 1)).toDF("s", "y")
    assert(Evaluation.aucBinary(oneClass, col("s"), col("y"))
      .collect().head.isNullAt(4))
  }

  test("prCurve: exact TP/FP/FN walk across thresholds") {
    import spark.implicits._
    val df = Seq((0.9, 1), (0.8, 0), (0.7, 1), (0.6, 0)).toDF("s", "y")
    val rows = Evaluation.prCurve(df, col("s"), col("y"))
      .orderBy(col("threshold").desc).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows(0) == (0.9, 1L, 0L, 1L, 1.0, 0.5))   // t=0.9: only the top hit
    assert(rows(1) == (0.8, 1L, 1L, 1L, 0.5, 0.5))
    assert(rows(2) == (0.7, 2L, 1L, 0L, round6(2.0 / 3), 1.0))
    assert(rows(3) == (0.6, 2L, 2L, 0L, 0.5, 1.0))
  }

  test("aucBinaryBy: per-group AUC matches the global op run per group") {
    import spark.implicits._
    val df = Seq(
      ("g1", 0.1, 0), ("g1", 0.2, 0), ("g1", 0.3, 1), ("g1", 0.3, 0),
      ("g1", 0.4, 1),
      ("g2", 0.5, 1), ("g2", 0.6, 0), // inverted ranking → AUC 0
      ("g3", 0.9, 1), ("g3", 0.8, 1)  // single class → NULL
    ).toDF("grp", "s", "y")
    val got = Evaluation.aucBinaryBy(df, "grp", col("s"), col("y"))
      .orderBy("grp").collect()
    assert(got(0).getString(0) == "g1" &&
      got(0).getDouble(5) == round6(5.5 / 6.0))
    assert(got(1).getDouble(5) == 0.0)
    assert(got(2).isNullAt(5))
    // per-group results equal running the global op on each slice
    val solo = Evaluation.aucBinary(df.filter(col("grp") === "g1"),
      col("s"), col("y")).collect().head.getDouble(4)
    assert(solo == got(0).getDouble(5))
  }

  test("calibration: exact bin stats, ECE terms, out-of-range clamps to edge bins") {
    import spark.implicits._
    val df = Seq((0.05, 0), (0.05, 1), (0.95, 1), (0.95, 1), (0.55, 0),
      (1.0, 1), (-0.2, 0)).toDF("p", "y")
    val rows = Evaluation.calibration(df, col("p"), col("y"),
        bins = 10, scale = 2)
      .orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(6)))
    // bin 0: p={0.05,0.05,-0.2 clamped}; bin 5: {0.55}; bin 9: {0.95,0.95,1.0 clamped}
    assert(rows.map(_._1).toSeq == Seq(0, 5, 9))
    val b0 = rows(0); val b5 = rows(1); val b9 = rows(2)
    assert(b0._2 == 3 && b0._3 == 1)
    assert(b0._4 == round6((0.05 + 0.05 - 0.2) / 3)) // mean conf incl. clamp
    assert(b5._2 == 1 && b5._3 == 0 && b5._4 == 0.55)
    assert(b9._2 == 3 && b9._3 == 3 && b9._4 == round6(2.9 / 3))
    // ECE terms sum to ECE; spot-check bin 5: |0 − 0.55|·1/7
    assert(b5._6 == round6(0.55 / 7))
  }

  test("retrievalMetrics: NDCG/MRR from literal discounts, capped ideal, zero-hit query") {
    import spark.implicits._
    val w = Evaluation.dcgWeightsMicro(3)
    assert(w == Seq(1000000L, 630930L, 500000L))
    val ranked = Seq(
      ("A", 1, 1, 5L), ("A", 2, 0, 5L), ("A", 3, 1, 5L),
      ("B", 1, 0, 5L), ("B", 2, 0, 5L), ("B", 3, 0, 5L),
      ("C", 1, 0, 1L), ("C", 2, 1, 1L), ("C", 3, 0, 1L)
    ).toDF("q", "rank", "rel", "n_rel")
    val got = Evaluation.retrievalMetrics(ranked, "q", "rank", "rel",
        "n_rel", k = 3)
      .orderBy("q").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got(0) == (("A", 2L, round6(1500000.0 / 2130930.0), 1.0)))
    assert(got(1) == (("B", 0L, 0.0, 0.0)))
    // C has only ONE relevant doc in the corpus → ideal DCG caps at m=1
    assert(got(2) == (("C", 1L, round6(630930.0 / 1000000.0), 0.5)))
  }

  test("rocCurve: exact TP/FP walk with TPR/FPR coordinates") {
    import spark.implicits._
    val df = Seq((0.9, 1), (0.8, 0), (0.7, 1), (0.6, 0)).toDF("s", "y")
    val rows = Evaluation.rocCurve(df, col("s"), col("y"))
      .orderBy(col("threshold").desc).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows(0) == (0.9, 1L, 0L, 0.5, 0.0))
    assert(rows(1) == (0.8, 1L, 1L, 0.5, 0.5))
    assert(rows(2) == (0.7, 2L, 1L, 1.0, 0.5))
    assert(rows(3) == (0.6, 2L, 2L, 1.0, 1.0))
    // single-class input → the empty class's rate is NULL, not 0/0
    val onePos = Seq((0.9, 1), (0.8, 1)).toDF("s", "y")
    assert(Evaluation.rocCurve(onePos, col("s"), col("y"))
      .collect().forall(_.isNullAt(4)))
  }

  test("cohenKappa: textbook 2x2, multi-category, NULLs, degenerate") {
    import spark.implicits._
    // yes/yes 20, yes/no 5, no/yes 10, no/no 15: po=0.7, pe=0.5, k=0.4
    val twoByTwo =
      Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no")) ++
      Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no"))
    val r = Evaluation.cohenKappa(twoByTwo.toDF("a", "b"),
      col("a"), col("b")).collect().head
    assert(r.getLong(0) == 50 && r.getDouble(1) == 0.7 &&
      r.getDouble(2) == 0.5 && r.getDouble(3) == 0.4)
    // categories only one rater uses contribute 0 to pe, not an error
    val multi = Seq(("x", "x"), ("y", "z"), ("z", "y")).toDF("a", "b")
    val m = Evaluation.cohenKappa(multi, col("a"), col("b")).collect().head
    // po = 1/3; pe = (1·1 + 1·1 + 1·1)/9 = 1/3; kappa = 0
    assert(m.getDouble(1) == round6(1.0 / 3) && m.getDouble(2) ==
      round6(1.0 / 3) && m.getDouble(3) == 0.0)
    // NULL ratings are excluded rows
    val withNull = Seq(("a", Some("a")), ("b", None), ("a", Some("a")))
      .toDF("a", "b")
    assert(Evaluation.cohenKappa(withNull, col("a"), col("b"))
      .collect().head.getLong(0) == 2)
    // single shared category → pe = 1 → kappa NULL
    val const = Seq(("k", "k"), ("k", "k")).toDF("a", "b")
    assert(Evaluation.cohenKappa(const, col("a"), col("b"))
      .collect().head.isNullAt(3))
  }

  test("spearman: monotone, inverted, known permutation, ties, degenerate") {
    import spark.implicits._
    def rho(xs: Seq[(Double, Double)]): Option[Double] = {
      val r = Evaluation.spearman(xs.toDF("x", "y"), col("x"), col("y"))
        .collect().head
      if (r.isNullAt(1)) None else Some(r.getDouble(1))
    }
    assert(rho(Seq((1.0, 10.0), (2.0, 20.0), (3.0, 30.0))) == Some(1.0))
    assert(rho(Seq((1.0, 30.0), (2.0, 20.0), (3.0, 10.0))) == Some(-1.0))
    // ranks x = 1..4, ranks y = (1,3,2,4): rho = 1 - 6·2/(4·15) = 0.8
    assert(rho(Seq((1.0, 1.0), (2.0, 3.0), (3.0, 2.0), (4.0, 4.0)))
      == Some(0.8))
    // tied x → midranks (1.5, 1.5, 3) vs (1,2,3): rho = √3/2
    assert(rho(Seq((1.0, 3.0), (1.0, 5.0), (2.0, 7.0)))
      == Some(round6(math.sqrt(3.0) / 2.0)))
    // constant variable → NULL, not NaN
    assert(rho(Seq((5.0, 1.0), (5.0, 2.0), (5.0, 3.0))).isEmpty)
  }

  test("ksTwoSample: hand-computed ECDF gap, identical sides, empty side") {
    import spark.implicits._
    // a={1,2,3}, b={2,3,4}: cumA·nb−cumB·na over merged {1,2,3,4} is
    // 3,3,3,0 → D = 3/(3·3) at the smallest arg-max value 1
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val b = Seq(2.0, 3.0, 4.0).toDF("v")
    val r = Evaluation.ksTwoSample(a, b, col("v")).collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 3 && r.getLong(2) == 4)
    assert(r.getDouble(3) == round6(3.0 / 9.0))
    assert(r.getDouble(4) == 1.0)
    // identical distributions → D = 0 at the smallest value
    val same = Evaluation.ksTwoSample(a, a, col("v")).collect().head
    assert(same.getDouble(3) == 0.0 && same.getDouble(4) == 1.0)
    // empty side → NULL d_stat (undefined, not 0 or 1)
    val empty = Seq.empty[Double].toDF("v")
    assert(Evaluation.ksTwoSample(a, empty, col("v"))
      .collect().head.isNullAt(3))
  }

  test("kendallTau: concordant, discordant, tie-corrected, guards") {
    import spark.implicits._
    def tau(xs: Seq[(Double, Double)]): org.apache.spark.sql.Row =
      Evaluation.kendallTau(xs.toDF("x", "y"), col("x"), col("y"))
        .collect().head
    val up = tau(Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0)))
    assert(up.getLong(2) == 3 && up.getLong(3) == 0)
    assert(up.getDouble(4) == 1.0)
    assert(tau(Seq((1.0, 3.0), (2.0, 2.0), (3.0, 1.0))).getDouble(4) == -1.0)
    // ties on both sides: C=4, D=0, n0=6, tx=ty=1 → 4/√(5·5) = 0.8
    val tied = tau(Seq((1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (3.0, 3.0)))
    assert(tied.getLong(0) == 4 && tied.getLong(1) == 4)
    assert(tied.getLong(2) == 4 && tied.getLong(3) == 0)
    assert(tied.getDouble(4) == 0.8)
    // constant variable → NULL tau
    assert(tau(Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0))).isNullAt(4))
    // maxCells fail-fast
    val ex = intercept[Exception] {
      Evaluation.kendallTau(
        Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0)).toDF("x", "y"),
        col("x"), col("y"), maxCells = 2).collect()
    }
    assert(ex.getMessage.contains("maxCells") ||
      Option(ex.getCause).exists(_.getMessage.contains("maxCells")))
  }

  test("fleissKappa: hand-computed panel, NULL row excluded, guards") {
    import spark.implicits._
    // 3 raters, items r = (3,0,2,1): P̄ = 16/24 = 2/3, p1 = 0.5,
    // P̄e = 0.5 → kappa = (2/3 − 1/2)/(1/2) = 1/3
    val df = Seq((1, 1, 1), (0, 0, 0), (1, 1, 0), (1, 0, 0))
      .toDF("r1", "r2", "r3")
    val cols = Seq(col("r1"), col("r2"), col("r3"))
    val r = Evaluation.fleissKappa(df, cols).collect().head
    assert(r.getLong(0) == 4 && r.getInt(1) == 3)
    assert(r.getDouble(2) == round6(2.0 / 3.0))
    assert(r.getDouble(3) == 0.5)
    assert(r.getDouble(4) == round6(1.0 / 3.0))
    // an incomplete panel (NULL rating) drops the item, not the run
    val withNull = Seq((Some(1), Some(1), Some(1)), (Some(0), Some(0), Some(0)),
      (Some(1), Some(1), Some(0)), (Some(1), Some(0), Some(0)),
      (Some(1), None, Some(1))).toDF("r1", "r2", "r3")
    val rn = Evaluation.fleissKappa(withNull, cols).collect().head
    assert(rn.getLong(0) == 4 && rn.getDouble(4) == round6(1.0 / 3.0))
    // unanimous panel on both categories → kappa 1
    val perfect = Seq((1, 1, 1), (0, 0, 0)).toDF("r1", "r2", "r3")
    assert(Evaluation.fleissKappa(perfect, cols)
      .collect().head.getDouble(4) == 1.0)
    // degenerate p_e = 1 (every rating identical) → NULL kappa
    val const = Seq((1, 1, 1), (1, 1, 1)).toDF("r1", "r2", "r3")
    assert(Evaluation.fleissKappa(const, cols).collect().head.isNullAt(4))
    // out-of-domain rating fails fast instead of corrupting the weights
    val bad = Seq((1, 2, 1)).toDF("r1", "r2", "r3")
    val ex = intercept[Exception] {
      Evaluation.fleissKappa(bad, cols).collect()
    }
    assert(ex.getMessage.contains("fleissKappa") ||
      Option(ex.getCause).exists(_.getMessage.contains("fleissKappa")))
    // fewer than 2 raters rejected up front
    intercept[IllegalArgumentException] {
      Evaluation.fleissKappa(df, Seq(col("r1")))
    }
  }

  test("confusionMatrix: zero-filled spine, row rates, NULL exclusion") {
    import spark.implicits._
    // actuals {a,b}, predictions {a,c}: spine is 3x3 = 9 cells
    val df = Seq(("a", "a"), ("a", "c"), ("b", "a"),
      (null, "a"), ("b", null)).toDF("y", "p")
    val rows = Evaluation.confusionMatrix(df, col("y"), col("p"))
      .orderBy("actual", "predicted").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3)))
    assert(rows.length == 9)
    assert(rows.toSeq == Seq(
      ("a", "a", 1L, 0.5), ("a", "b", 0L, 0.0), ("a", "c", 1L, 0.5),
      ("b", "a", 1L, 1.0), ("b", "b", 0L, 0.0), ("b", "c", 0L, 0.0),
      // label c never occurs as actual → row_rate NULL across its row
      ("c", "a", 0L, -1.0), ("c", "b", 0L, -1.0), ("c", "c", 0L, -1.0)))
  }

  test("classificationReport: hand-computed P/R/F1, degenerate NULLs") {
    import spark.implicits._
    // a: tp=2, n_actual=3, n_predicted=2 → P=1, R=2/3, F1=0.8
    // b: tp=1, n_actual=2, n_predicted=2 → P=R=F1=0.5
    // c: predicted only → recall/F1 NULL; never right → P=0
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "c"))
      .toDF("y", "p")
    val rows = Evaluation.classificationReport(df, col("y"), col("p"))
      .orderBy("label").collect()
    val a = rows(0)
    assert(a.getString(0) == "a" && a.getLong(1) == 3 && a.getLong(2) == 2
      && a.getLong(3) == 2)
    assert(a.getDouble(4) == 1.0 && a.getDouble(5) == round6(2.0 / 3.0))
    assert(a.getDouble(6) == 0.8)
    val b = rows(1)
    assert(b.getLong(1) == 2 && b.getLong(2) == 2 && b.getLong(3) == 1)
    assert(b.getDouble(4) == 0.5 && b.getDouble(5) == 0.5
      && b.getDouble(6) == 0.5)
    val c = rows(2)
    assert(c.getLong(1) == 0 && c.getLong(2) == 1 && c.getLong(3) == 0)
    assert(c.getDouble(4) == 0.0 && c.isNullAt(5) && c.isNullAt(6))
  }

  test("probScores: hand-computed Brier and clamped log-loss") {
    import spark.implicits._
    val df = Seq((0.8, 1), (0.4, 0), (0.5, 1)).toDF("p", "y")
    val r = Evaluation.probScores(df, col("p"), col("y")).collect().head
    assert(r.getLong(0) == 3)
    assert(r.getDouble(1) ==
      round6((0.04 + 0.16 + 0.25) / 3.0))
    assert(r.getDouble(2) == round6(
      (-math.log(0.8) - math.log(0.6) - math.log(0.5)) / 3.0))
    // a hard 0-probability miss is clamped, not infinite
    val hard = Seq((0.0, 1)).toDF("p", "y")
    val h = Evaluation.probScores(hard, col("p"), col("y")).collect().head
    assert(h.getDouble(2) == round6(-math.log(1e-15)))
    intercept[IllegalArgumentException] {
      Evaluation.probScores(df, col("p"), col("y"), eps = 0.7)
    }
  }

  test("diffInDiff: hand-computed 2x2, empty cell NULL, guards") {
    import spark.implicits._
    // ctrl pre mean 1, ctrl post 2 (trend +1); treat pre 3, treat post 6
    // → DiD = (6−3) − (2−1) = 2
    val df = Seq((0, 0, 1.0), (0, 0, 1.0), (0, 1, 2.0),
      (1, 0, 3.0), (1, 1, 6.0)).toDF("t", "p", "v")
    val r = Evaluation.diffInDiff(df, col("t"), col("p"), col("v"))
      .collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 1 && r.getLong(2) == 1 &&
      r.getLong(3) == 1)
    assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 2.0)
    assert(r.getDouble(6) == 3.0 && r.getDouble(7) == 6.0)
    assert(r.getDouble(8) == 2.0)
    // an empty cell → NULL did (its mean NULL too), not a crash
    val sparse = Seq((0, 0, 1.0), (1, 1, 5.0)).toDF("t", "p", "v")
    val s = Evaluation.diffInDiff(sparse, col("t"), col("p"), col("v"))
      .collect().head
    assert(s.isNullAt(5) && s.isNullAt(8))
    val ex = intercept[Exception] {
      Evaluation.diffInDiff(Seq((2, 0, 1.0)).toDF("t", "p", "v"),
        col("t"), col("p"), col("v")).collect()
    }
    assert(ex.getMessage.contains("diffInDiff") ||
      Option(ex.getCause).exists(_.getMessage.contains("diffInDiff")))
  }

  test("labelShiftBinary: hand-computed 2x2 solve, singular NULL, guards") {
    import spark.implicits._
    // C = [[0.75, 0.25], [0.25, 0.75]], mu0 = 0.6 → det 0.5,
    // pi = (0.7, 0.3)
    val hold = Seq((0, 0), (0, 0), (0, 0), (1, 0),
      (0, 1), (1, 1), (1, 1), (1, 1)).toDF("f", "y")
    val targ = (Seq.fill(6)(0) ++ Seq.fill(4)(1)).toDF("f")
    val r = Evaluation.labelShiftBinary(hold, targ, col("f"), col("y"))
      .collect().head
    assert(r.getLong(0) == 8 && r.getLong(1) == 10)
    assert(r.getDouble(2) == 0.5)
    assert(r.getDouble(3) == 0.6 && r.getDouble(4) == 0.4)
    assert(r.getDouble(5) == 0.7 && r.getDouble(6) == 0.3)
    // useless classifier (identical columns) → singular → NULL pi
    val flat = Seq((0, 0), (1, 0), (0, 1), (1, 1)).toDF("f", "y")
    val sNull = Evaluation.labelShiftBinary(flat, targ, col("f"), col("y"))
      .collect().head
    assert(sNull.getDouble(2) == 0.0 && sNull.isNullAt(5) && sNull.isNullAt(6))
    val ex = intercept[Exception] {
      Evaluation.labelShiftBinary(Seq((2, 0)).toDF("f", "y"), targ,
        col("f"), col("y")).collect()
    }
    assert(ex.getMessage.contains("labelShiftBinary") ||
      Option(ex.getCause).exists(_.getMessage.contains("labelShiftBinary")))
  }

  test("gainsTable: hand-computed buckets, run-keeps-together, lift math") {
    import spark.implicits._
    // 4 distinct scores, buckets=2: ranks 1..4 → ceil(cum*2/4):
    // 0.9 (cum1→1), 0.8 (cum2→1), 0.7 (cum3→2), 0.6 (cum4→2)
    val df = Seq((0.9, 1), (0.8, 1), (0.7, 0), (0.6, 0)).toDF("s", "y")
    val rows = Evaluation.gainsTable(df, col("s"), col("y"), buckets = 2)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7)))
    assert(rows(0) == ((1, 2L, 2L, 1.0, 2L, 2L, 1.0, 2.0)))
    assert(rows(1) == ((2, 2L, 0L, 0.0, 4L, 2L, 1.0, 1.0)))
    // a tied score RUN lands whole in its last rank's bucket
    val tied = Seq((0.9, 1), (0.5, 0), (0.5, 0), (0.5, 1)).toDF("s", "y")
    val tr = Evaluation.gainsTable(tied, col("s"), col("y"), buckets = 2)
      .orderBy("bucket").collect()
    assert(tr.length == 2 && tr(0).getLong(1) == 1 && tr(1).getLong(1) == 3)
    // all-negative labels → capture/lift NULL, rates still real
    val neg = Seq((0.9, 0), (0.8, 0)).toDF("s", "y")
    assert(Evaluation.gainsTable(neg, col("s"), col("y"), buckets = 2)
      .collect().forall(r => r.isNullAt(6) && r.isNullAt(7)))
    val ex = intercept[Exception] {
      Evaluation.gainsTable(Seq((0.9, 2)).toDF("s", "y"),
        col("s"), col("y")).collect()
    }
    assert(ex.getMessage.contains("gainsTable") ||
      Option(ex.getCause).exists(_.getMessage.contains("gainsTable")))
  }

  test("covariateBalance: SMD 1 on unit shift, 0 on identical, NULL on constant") {
    import spark.implicits._
    // shifted: t={1,3} (mean 2, var 1), c={0,2} (mean 1, var 1) → SMD 1
    // same: identical sets both sides → SMD 0
    // const: variance 0 both sides → NULL
    val df = Seq(
      (1, 1.0, 5.0, 7.0), (1, 3.0, 6.0, 7.0),
      (0, 0.0, 5.0, 7.0), (0, 2.0, 6.0, 7.0)
    ).toDF("t", "shifted", "same", "const")
    val rows = Evaluation.covariateBalance(df, col("t"), Seq(
        "shifted" -> col("shifted"), "same" -> col("same"),
        "const" -> col("const")))
      .orderBy("covariate").collect()
    val byName = rows.map(r => r.getString(0) -> r).toMap
    assert(byName("shifted").getLong(1) == 2 &&
      byName("shifted").getLong(2) == 2)
    assert(byName("shifted").getDouble(3) == 2.0 &&
      byName("shifted").getDouble(4) == 1.0)
    assert(byName("shifted").getDouble(5) == 1.0)
    assert(byName("same").getDouble(5) == 0.0)
    assert(byName("const").isNullAt(5))
    val ex = intercept[Exception] {
      Evaluation.covariateBalance(Seq((2, 1.0)).toDF("t", "x"),
        col("t"), Seq("x" -> col("x"))).collect()
    }
    assert(ex.getMessage.contains("covariateBalance") ||
      Option(ex.getCause).exists(_.getMessage.contains("covariateBalance")))
  }

  test("abTest: entity-level collapse, pooled z, guards") {
    import spark.implicits._
    // a: u0 converts (2 events!), u2 doesn't; b: u1, u3 convert, u5 not
    val df = Seq(("a", 0L, 1), ("a", 0L, 0), ("a", 2L, 0),
      ("b", 1L, 1), ("b", 3L, 1), ("b", 3L, 0), ("b", 5L, 0))
      .toDF("v", "u", "c")
    val r = Evaluation.abTest(df, col("v"), col("u"), col("c"))
      .collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 3)
    assert(r.getLong(2) == 1 && r.getLong(3) == 2) // u0 counted ONCE
    assert(r.getDouble(4) == 0.5 && r.getDouble(5) == round6(2.0 / 3.0))
    assert(r.getDouble(6) == round6(2.0 / 3.0 - 0.5))
    val pp = 3.0 / 5.0
    val se = math.sqrt(pp * (1.0 - pp) * (1.0 / 2.0 + 1.0 / 3.0))
    assert(r.getDouble(7) == round6((2.0 / 3.0 - 0.5) / se))
    // universal conversion → pooled variance 0 → z NULL
    val all = Seq(("a", 1L, 1), ("b", 2L, 1)).toDF("v", "u", "c")
    assert(Evaluation.abTest(all, col("v"), col("u"), col("c"))
      .collect().head.isNullAt(7))
    val ex = intercept[Exception] {
      Evaluation.abTest(Seq(("c", 1L, 1)).toDF("v", "u", "c"),
        col("v"), col("u"), col("c")).collect()
    }
    assert(ex.getMessage.contains("abTest") ||
      Option(ex.getCause).exists(_.getMessage.contains("abTest")))
    // {0,1,NULL} converted contract (the mcnemar discipline): a 5 must
    // fail fast, not inflate conv sums into rates > 1
    val exC = intercept[Exception] {
      Evaluation.abTest(Seq(("a", 1L, 5), ("b", 2L, 1)).toDF("v", "u", "c"),
        col("v"), col("u"), col("c")).collect()
    }
    assert(exC.getMessage.contains("converted must be 0/1/NULL") ||
      Option(exC.getCause).exists(
        _.getMessage.contains("converted must be 0/1/NULL")))
  }

  test("jsDivergence: identical zero, disjoint ln2, hand case, empty side") {
    import spark.implicits._
    val x = Seq("x", "x", "y").toDF("b")
    val same = Evaluation.jsDivergence(x, x, col("b")).collect().head
    assert(same.getLong(0) == 3 && same.getLong(1) == 3 &&
      same.getLong(2) == 2 && same.getDouble(3) == 0.0)
    // disjoint supports hit the ln 2 bound
    val y = Seq("z").toDF("b")
    assert(Evaluation.jsDivergence(x, y, col("b")).collect()
      .head.getDouble(3) == round6(math.log(2.0)))
    // p=(2/3,1/3) vs q=(1/3,2/3)
    val q = Seq("x", "y", "y").toDF("b")
    val js = (2.0 / 3.0) * math.log(4.0 / 3.0) +
      (1.0 / 3.0) * math.log(2.0 / 3.0)
    val got = Evaluation.jsDivergence(x, q, col("b")).collect().head
    assert(math.abs(got.getDouble(3) - js) < 2e-6)
    // an empty side is NULL, not an ANSI divide-by-zero crash
    val empty = Seq.empty[String].toDF("b")
    assert(Evaluation.jsDivergence(x, empty, col("b"))
      .collect().head.isNullAt(3))
  }

  test("conformalThreshold: exact rank, ties, no-guarantee NULL") {
    import spark.implicits._
    val df = (1 to 10).map(_.toDouble).toDF("s")
    val r = Evaluation.conformalThreshold(df, col("s"), alpha = 0.25)
      .collect().head
    // rank = ceil(11 * 0.75) = 9 → 9th smallest = 9.0
    assert(r.getLong(0) == 10 && r.getLong(1) == 9 &&
      r.getDouble(2) == 9.0)
    // ties: [1,1,1,2] at alpha=0.5 → rank 3 lands inside the 1-run
    val ties = Seq(1.0, 1.0, 1.0, 2.0).toDF("s")
    assert(Evaluation.conformalThreshold(ties, col("s"), alpha = 0.5)
      .collect().head.getDouble(2) == 1.0)
    // rank beyond n → NULL threshold (no finite-sample guarantee)
    val tiny = Seq(1.0, 2.0).toDF("s")
    assert(Evaluation.conformalThreshold(tiny, col("s"), alpha = 0.1)
      .collect().head.isNullAt(2))
    intercept[IllegalArgumentException] {
      Evaluation.conformalThreshold(df, col("s"), alpha = 0.0)
    }
  }

  test("rankBiasedOverlap: identical, disjoint, and swapped-top rankings") {
    import spark.implicits._
    val a = Seq((1L, 3.0), (2L, 2.0), (3L, 1.0)).toDF("id", "s")
    // identical rankings at k=3, p=0.5 → 1 − p^k = 0.875
    val same = Evaluation.rankBiasedOverlap(a, a, col("id"), col("s"),
      k = 3, p = 0.5).collect().head
    assert(same.getInt(0) == 3 && same.getDouble(1) == 0.5)
    assert(same.getLong(2) == 3 && same.getDouble(3) == 0.875)
    // top-2 swapped: overlap@1 = 0, @2 = 2, @3 = 3 →
    // 0.5·(0 + 0.5·1 + 0.25·1) = 0.375
    val b = Seq((2L, 3.0), (1L, 2.0), (3L, 1.0)).toDF("id", "s")
    val swap = Evaluation.rankBiasedOverlap(a, b, col("id"), col("s"),
      k = 3, p = 0.5).collect().head
    assert(swap.getLong(2) == 3 && swap.getDouble(3) == 0.375)
    // disjoint id spaces → 0 overlap everywhere
    val c = Seq((7L, 3.0), (8L, 2.0)).toDF("id", "s")
    val none = Evaluation.rankBiasedOverlap(a, c, col("id"), col("s"),
      k = 3, p = 0.5).collect().head
    assert(none.getLong(2) == 0 && none.getDouble(3) == 0.0)
    intercept[IllegalArgumentException] {
      Evaluation.rankBiasedOverlap(a, b, col("id"), col("s"), k = 0)
    }
    intercept[IllegalArgumentException] {
      Evaluation.rankBiasedOverlap(a, b, col("id"), col("s"), k = 3, p = 1.0)
    }
  }

  test("fairnessPanel: per-group rates, gaps to global, degenerate NULLs") {
    import spark.implicits._
    // g1: (p,y) = (1,1)(1,0)(0,1)(0,0); g2: (1,1)(1,1)
    // global: pos 4/6, tpr 3/4, fpr 1/2
    val df = Seq(("g1", 1, 1), ("g1", 1, 0), ("g1", 0, 1), ("g1", 0, 0),
      ("g2", 1, 1), ("g2", 1, 1)).toDF("g", "p", "y")
    val rows = Evaluation.fairnessPanel(df, col("g"), col("p"), col("y"))
      .orderBy("group").collect()
    val g1 = rows(0)
    assert(g1.getLong(1) == 4 && g1.getDouble(2) == 0.5)
    assert(g1.getDouble(3) == 0.5 && g1.getDouble(4) == 0.5)
    assert(g1.getDouble(5) == round6(0.5 - 4.0 / 6.0))
    assert(g1.getDouble(6) == -0.25 && g1.getDouble(7) == 0.0)
    val g2 = rows(1)
    assert(g2.getLong(1) == 2 && g2.getDouble(2) == 1.0)
    assert(g2.getDouble(3) == 1.0)
    // no negatives in g2 → FPR and its gap NULL, not 0
    assert(g2.isNullAt(4) && g2.isNullAt(7))
    assert(g2.getDouble(5) == round6(1.0 - 4.0 / 6.0))
    assert(g2.getDouble(6) == 0.25)
    // out-of-domain prediction fails fast
    val ex = intercept[Exception] {
      Evaluation.fairnessPanel(Seq(("g", 3, 1)).toDF("g", "p", "y"),
        col("g"), col("p"), col("y")).collect()
    }
    assert(ex.getMessage.contains("fairnessPanel") ||
      Option(ex.getCause).exists(_.getMessage.contains("fairnessPanel")))
  }

  test("mcnemar: disagreement cells, continuity correction, guards") {
    import spark.implicits._
    // b=3 (a right, b wrong), c=1 → stat = (|3−1|−1)²/4 = 0.25
    val df = Seq((1, 1), (0, 0), (1, 0), (1, 0), (1, 0), (0, 1))
      .toDF("a", "b")
    val r = Evaluation.mcnemar(df, col("a"), col("b")).collect().head
    assert(r.getLong(0) == 6 && r.getLong(1) == 1 && r.getLong(2) == 1)
    assert(r.getLong(3) == 3 && r.getLong(4) == 1)
    assert(r.getDouble(5) == 0.25)
    // total agreement → NULL statistic
    val agree = Seq((1, 1), (0, 0)).toDF("a", "b")
    assert(Evaluation.mcnemar(agree, col("a"), col("b"))
      .collect().head.isNullAt(5))
    // out-of-domain indicator fails fast
    val ex = intercept[Exception] {
      Evaluation.mcnemar(Seq((2, 1)).toDF("a", "b"), col("a"), col("b"))
        .collect()
    }
    assert(ex.getMessage.contains("mcnemar") ||
      Option(ex.getCause).exists(_.getMessage.contains("mcnemar")))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("mannWhitney: hand-computed U with ties; empty side NULL") {
    import spark.implicits._
    // A = {1, 2}, B = {2, 3}: midranks 1, 2.5, 2.5, 4
    // R_a = 1 + 2.5 = 3.5; U_a = 3.5 - 3 = 0.5; cles = 0.125
    // ties: one t=2 run -> 6; sigma2 = (4/12)*((5) - 6/12) = 1.5
    val a = Seq(1.0, 2.0).toDF("v")
    val b = Seq(2.0, 3.0).toDF("v")
    val r = Evaluation.mannWhitney(a, b, col("v")).collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 2 && r.getLong(2) == 3)
    assert(r.getDouble(3) == 0.5)
    assert(r.getDouble(4) == 0.125)
    assert(r.getDouble(5) == round6((0.5 - 2.0) / math.sqrt(1.5)))
    // empty side -> NULL statistics
    val e = Evaluation.mannWhitney(a, Seq.empty[Double].toDF("v"), col("v"))
      .collect().head
    assert(e.isNullAt(3) && e.isNullAt(4) && e.isNullAt(5))
    // all values tied -> sigma = 0 -> z NULL, u defined
    val t = Evaluation.mannWhitney(Seq(5.0).toDF("v"),
      Seq(5.0, 5.0).toDF("v"), col("v")).collect().head
    assert(!t.isNullAt(3) && t.isNullAt(5))
  }

  test("anovaF: two separated groups; degenerate NULLs") {
    import spark.implicits._
    // a={1,2} b={5,6}: SSB=16, SSW=1, F=(16/1)/(1/2)=32, eta=16/17
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0), ("b", 6.0))
      .toDF("g", "v")
    val r = Evaluation.anovaF(df, col("g"), col("v"), scale = 4)
      .collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 3.5)           // grand mean
    assert(r.getDouble(3) == round6(16.0 / 17.0))
    assert(r.getDouble(4) == 32.0)
    // constant within groups -> SSW=0 -> F NULL (eta = 1)
    val c = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)).toDF("g", "v")
    val rc = Evaluation.anovaF(c, col("g"), col("v")).collect().head
    assert(rc.getDouble(3) == 1.0 && rc.isNullAt(4))
    // globally constant -> SST=0 -> eta NULL too
    val k = Seq(("a", 3.0), ("b", 3.0)).toDF("g", "v")
    val rk = Evaluation.anovaF(k, col("g"), col("v")).collect().head
    assert(rk.isNullAt(3) && rk.isNullAt(4))
  }

  test("wilsonRanking: closed form at 8/10; domain guard") {
    import spark.implicits._
    val df = (Seq.fill(8)(("a", 1)) ++ Seq.fill(2)(("a", 0))).toDF("g", "y")
    val r = Evaluation.wilsonRanking(df, col("g"), col("y")).collect().head
    val (p, n, z) = (0.8, 10.0, 1.96)
    val z2 = z * z
    val expected = (p + z2 / (2.0 * n) -
      z * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))) / (1.0 + z2 / n)
    assert(r.getLong(1) == 10 && r.getLong(2) == 8)
    assert(r.getDouble(3) == 0.8)
    assert(r.getDouble(4) == round6(expected))
    val ex = intercept[Exception] {
      Evaluation.wilsonRanking(Seq(("a", 2)).toDF("g", "y"),
        col("g"), col("y")).collect()
    }
    assert(ex.getMessage.contains("wilsonRanking") ||
      Option(ex.getCause).exists(_.getMessage.contains("wilsonRanking")))
  }

  test("isotonicFit: PAV pooling, monotone output, weighted bins, guards") {
    import spark.implicits._
    // rates [1, 0, 1] -> PAV pools the first two bins to 0.5
    val df = Seq((0.1, 1), (0.2, 0), (0.3, 1)).toDF("s", "y")
    val out = Evaluation.isotonicFit(df, col("s"), col("y"))
      .orderBy("score").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toList == List(
      (0.1, 1L, 1.0, 0.5), (0.2, 1L, 0.0, 0.5), (0.3, 1L, 1.0, 1.0)))
    // weighted: duplicate rows act as bin weights
    val wdf = Seq((0.1, 1), (0.1, 1), (0.1, 1), (0.2, 0)).toDF("s", "y")
    val wout = Evaluation.isotonicFit(wdf, col("s"), col("y"))
      .orderBy("score").collect().map(_.getDouble(3))
    assert(wout.toList == List(0.75, 0.75)) // pooled weighted mean 3/4
    // already monotone input -> fit equals the empirical rates
    val mono = Seq((0.1, 0), (0.2, 1), (0.3, 1)).toDF("s", "y")
    val mout = Evaluation.isotonicFit(mono, col("s"), col("y"))
      .orderBy("score").collect().map(_.getDouble(3))
    assert(mout.toList == List(0.0, 1.0, 1.0))
    // guards: out-of-domain label, too many bins
    val exDomain = intercept[Exception] {
      Evaluation.isotonicFit(Seq((0.1, 2)).toDF("s", "y"),
        col("s"), col("y")).collect()
    }
    assert(exDomain.getMessage.contains("isotonicFit") ||
      Option(exDomain.getCause).exists(_.getMessage.contains("isotonicFit")))
    val exBins = intercept[Exception] {
      Evaluation.isotonicFit(
        (1 to 20).map(i => (i * 0.01, i % 2)).toDF("s", "y"),
        col("s"), col("y"), maxBins = 10L).collect()
    }
    assert(exBins.getMessage.contains("maxBins") ||
      Option(exBins.getCause).exists(_.getMessage.contains("maxBins")))
  }

  test("cuped: hand-computed theta/diffs; mixed-arm unit fails fast") {
    import spark.implicits._
    // units (t, pre, post): T:(1,10),(2,20)  C:(1,12),(3,30)
    // x = [1,2,1,3] y = [10,20,12,30]; theta = cov/var
    val df = Seq(
      (1L, true, false, 1.0), (1L, true, true, 10.0),
      (2L, true, false, 2.0), (2L, true, true, 20.0),
      (3L, false, false, 1.0), (3L, false, true, 12.0),
      (4L, false, false, 3.0), (4L, false, true, 30.0))
      .toDF("u", "t", "p", "v")
    val r = Evaluation.cuped(df, col("u"), col("t"), col("p"), col("v"))
      .collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 2 && r.getLong(2) == 2)
    // exact moments at scale 2: x=[100,200,100,300], y=[1000,2000,1200,3000]
    val x = Seq(100.0, 200.0, 100.0, 300.0)
    val y = Seq(1000.0, 2000.0, 1200.0, 3000.0)
    val n = 4.0
    val covN = n * x.zip(y).map { case (a, b) => a * b }.sum - x.sum * y.sum
    val varxN = n * x.map(a => a * a).sum - x.sum * x.sum
    val varyN = n * y.map(a => a * a).sum - y.sum * y.sum
    val theta = covN / varxN
    assert(r.getDouble(3) == round6(theta))
    assert(r.getDouble(4) == round6(x.sum / n / 100.0))
    val diffRaw = (3000.0 / 2 - 4200.0 / 2) / 100.0
    val diffPre = (300.0 / 2 - 400.0 / 2) / 100.0
    assert(r.getDouble(5) == round6(diffRaw))
    assert(r.getDouble(6) == round6(diffRaw - theta * diffPre))
    assert(r.getDouble(7) == round6(covN * covN / (varxN * varyN)))
    // one arm empty -> diffs NULL, theta still defined
    val oneArm = Evaluation.cuped(df.filter(col("t")), col("u"), col("t"),
      col("p"), col("v")).collect().head
    assert(oneArm.isNullAt(5) && oneArm.isNullAt(6) && !oneArm.isNullAt(3))
    // a unit seen under both arms is a corrupted assignment
    val bad = df.union(Seq((1L, false, true, 5.0)).toDF("u", "t", "p", "v"))
    val ex = intercept[Exception] {
      Evaluation.cuped(bad, col("u"), col("t"), col("p"), col("v")).collect()
    }
    assert(ex.getMessage.contains("cuped") ||
      Option(ex.getCause).exists(_.getMessage.contains("cuped")))
  }

  test("kruskalWallis: two-group case reduces to Mann-Whitney z²; guards") {
    import spark.implicits._
    // untied 3-group case: groups {1,2},{3,4},{5,6}; ranks 1..6
    // R = (3, 7, 11); H = 12/(6*7) * (9/2 + 49/2 + 121/2) - 3*7
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0),
      ("c", 5.0), ("c", 6.0)).toDF("g", "v")
    val r = Evaluation.kruskalWallis(df, col("g"), col("v")).collect().head
    val h = 12.0 / 42.0 * ((9.0 + 49.0 + 121.0) / 2.0) - 21.0
    assert(r.getLong(0) == 6 && r.getLong(1) == 3 && r.getLong(2) == 6)
    assert(r.getDouble(3) == round6(h))
    assert(r.getDouble(4) == round6(h)) // no ties -> correction = 1
    // ties: correction < 1 -> h_corrected > h
    val t = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0))
      .toDF("g", "v")
    val rt = Evaluation.kruskalWallis(t, col("g"), col("v")).collect().head
    assert(rt.getDouble(4) > rt.getDouble(3))
    // all values identical -> C = 0 -> h_corrected NULL, h = 0ish
    val k = Seq(("a", 5.0), ("b", 5.0), ("c", 5.0)).toDF("g", "v")
    val rk = Evaluation.kruskalWallis(k, col("g"), col("v")).collect().head
    assert(!rk.isNullAt(3) && rk.isNullAt(4))
    // single group -> h NULL
    val one = Evaluation.kruskalWallis(
      Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v"), col("g"), col("v"))
      .collect().head
    assert(one.isNullAt(3) && one.isNullAt(4))
  }

  test("blandAltman: hand bias/limits; outside count; n<2 guard") {
    import spark.implicits._
    // diffs: 0, 0, 2, -2, 10 -> bias 2, sd = sqrt((5*108-100)/20)
    val df = Seq((5.0, 5.0), (7.0, 7.0), (4.0, 2.0), (1.0, 3.0),
      (12.0, 2.0)).toDF("a", "b")
    val r = Evaluation.blandAltman(df, col("a"), col("b")).collect().head
    val bias = 10.0 / 5.0
    val sd = math.sqrt((5.0 * 108.0 - 100.0) / (5.0 * 4.0))
    assert(r.getLong(0) == 5)
    assert(r.getDouble(1) == bias)
    assert(r.getDouble(2) == round6(sd))
    assert(r.getDouble(3) == round6(bias - 1.96 * sd))
    assert(r.getDouble(4) == round6(bias + 1.96 * sd))
    // only d=10 falls outside bias +- 1.96*sd (~[-6.9, 10.9])? no:
    // hi = 2 + 1.96*4.9 = 11.6 -> 10 inside; lo = -7.6 -> -2 inside
    assert(r.getLong(5) == 0 && r.getDouble(6) == 0.0)
    // a tight cluster plus one far outlier lands outside the limits
    val o = (Seq.fill(20)((1.0, 1.0)) :+ (1000.0, 1.0)).toDF("a", "b")
    val ro = Evaluation.blandAltman(o, col("a"), col("b")).collect().head
    assert(ro.getLong(5) == 1)
    // single row -> sd/limits/outside NULL, bias kept
    val s1 = Evaluation.blandAltman(Seq((3.0, 1.0)).toDF("a", "b"),
      col("a"), col("b")).collect().head
    assert(s1.getDouble(1) == 2.0 && s1.isNullAt(2) && s1.isNullAt(5))
  }

  test("cochranQ: textbook 3-rater grid; unanimous NULL; domain guard") {
    import spark.implicits._
    // 4 items x 3 raters: rows (1,1,0),(1,0,0),(0,1,1),(1,1,1)
    // C = (3,3,2), R = (2,1,2,3); Q = 2*(3*22 - 64)/(3*8 - 18) = 2/3
    val df = Seq((1, 1, 0), (1, 0, 0), (0, 1, 1), (1, 1, 1))
      .toDF("r1", "r2", "r3")
    val r = Evaluation.cochranQ(df,
      Seq(col("r1"), col("r2"), col("r3"))).collect().head
    assert(r.getLong(0) == 4 && r.getInt(1) == 3)
    assert(r.getDouble(2) == round6(2.0 * (3.0 * 22 - 64) / (3.0 * 8 - 18)))
    // incomplete panel rows drop
    val withNull = df.union(
      Seq((1, 1, 1)).toDF("r1", "r2", "r3")
        .select(lit(null).cast("int").as("r1"), col("r2"), col("r3")))
    val rn = Evaluation.cochranQ(withNull,
      Seq(col("r1"), col("r2"), col("r3"))).collect().head
    assert(rn.getLong(0) == 4 && rn.getDouble(2) == r.getDouble(2))
    // every item unanimous -> denominator 0 -> Q NULL
    val u = Seq((1, 1, 1), (0, 0, 0)).toDF("r1", "r2", "r3")
    assert(Evaluation.cochranQ(u, Seq(col("r1"), col("r2"), col("r3")))
      .collect().head.isNullAt(2))
    // out-of-domain rating fails fast
    val ex = intercept[Exception] {
      Evaluation.cochranQ(Seq((2, 1, 0)).toDF("r1", "r2", "r3"),
        Seq(col("r1"), col("r2"), col("r3"))).collect()
    }
    assert(ex.getMessage.contains("cochranQ") ||
      Option(ex.getCause).exists(_.getMessage.contains("cochranQ")))
  }

  test("brownForsythe: unequal spreads detected, equal spreads W~0") {
    import spark.implicits._
    // a tight around 10, b wide around 10: |z| differs -> W large
    val df = Seq(("a", 9.0), ("a", 10.0), ("a", 11.0), ("a", 10.0),
      ("b", 2.0), ("b", 10.0), ("b", 18.0), ("b", 10.0)).toDF("g", "v")
    val r = Evaluation.brownForsythe(df, col("g"), col("v")).collect().head
    assert(r.getLong(0) == 8 && r.getLong(1) == 2)
    // hand: med_a = 10 -> z_a = [1,0,1,0]; med_b = 10 -> z_b = [8,0,8,0]
    // mean_absdev = (2 + 16)/8 = 2.25
    assert(r.getDouble(2) == 2.25)
    assert(r.getDouble(4) > 1.0)
    // identical spreads -> SSB = 0 -> W = 0 (z has within variation)
    val eq = Seq(("a", 1.0), ("a", 3.0), ("a", 5.0),
      ("b", 11.0), ("b", 13.0), ("b", 15.0)).toDF("g", "v")
    val re = Evaluation.brownForsythe(eq, col("g"), col("v")).collect().head
    assert(re.getDouble(4) == 0.0)
    // all-z-identical (no within variation) -> SSW = 0 -> W NULL
    val flat = Seq(("a", 1.0), ("a", 3.0), ("b", 11.0), ("b", 13.0))
      .toDF("g", "v")
    assert(Evaluation.brownForsythe(flat, col("g"), col("v"))
      .collect().head.isNullAt(4))
  }
}
