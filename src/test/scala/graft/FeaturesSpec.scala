package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Features

class FeaturesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("looTargetEncode: excludes own target, smooths toward global mean, keeps null-cat rows") {
    import spark.implicits._
    // cat A: targets 10, 20, 30; cat B singleton 100; one null-cat row.
    val df = Seq(
      (1L, Some("A"), 10.0), (2L, Some("A"), 20.0), (3L, Some("A"), 30.0),
      (4L, Some("B"), 100.0), (5L, None: Option[String], 50.0)
    ).toDF("id", "cat", "y")
    val m = 2.0
    val gm = (10 + 20 + 30 + 100 + 50) / 5.0 // 42.0
    val got = Features.looTargetEncode(df, "id", "cat", "y",
        scale = 2, smoothing = m)
      .orderBy("id").collect()
    // row 1: (S_A - y_1 + m*gm)/(n_A - 1 + m) = (60-10+84)/(3-1+2)
    assert(math.abs(got(0).getDouble(3) - (60 - 10 + m * gm) / 4.0) < 1e-6)
    assert(math.abs(got(1).getDouble(3) - (60 - 20 + m * gm) / 4.0) < 1e-6)
    // singleton B: no other rows — pure smoothed prior (0 + m*gm)/(0 + m) = gm
    assert(math.abs(got(3).getDouble(3) - gm) < 1e-6)
    // null-cat row survives (LEFT join) with a null encoding
    assert(got.length == 5 && got(4).isNullAt(3))
  }

  test("standardize: hand-computed z and min-max, constant column scales to null") {
    import spark.implicits._
    val df = Seq((1L, 1.0, 5.0), (2L, 2.0, 5.0), (3L, 3.0, 5.0))
      .toDF("id", "x", "c")
    val out = Features.standardize(df, Seq("id"), Seq("x", "c"), scale = 2)
      .orderBy("id").collect()
    // x: mean 2, population std = sqrt(2/3)
    val std = math.sqrt(2.0 / 3.0)
    assert(math.abs(out(0).getDouble(1) - math.rint((1 - 2) / std * 1e6) / 1e6) < 1e-9)
    assert(out(1).getDouble(1) == 0.0)
    assert(math.abs(out(0).getDouble(2) - 0.0) < 1e-9) // min-max of min = 0
    assert(math.abs(out(2).getDouble(2) - 1.0) < 1e-9) // min-max of max = 1
    // constant column: std = 0 and range = 0 → nulls, not NaN/Infinity
    assert(out.forall(r => r.isNullAt(3) && r.isNullAt(4)))
  }

  test("miRanking: perfect feature = H(Y), constant = 0, NULL support") {
    import spark.implicits._
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val df = Seq(
      ("a", "a", "x", Some("a")), ("a", "a", "x", Some("a")),
      ("b", "b", "x", None), ("b", "b", "x", Some("b"))
    ).toDF("y", "perfect", "const", "sparse")
    val rows = Features.miRanking(df, Seq(
        "perfect" -> col("perfect"), "const" -> col("const"),
        "sparse" -> col("sparse")),
        col("y"))
      .orderBy("feature").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getInt(5)))
    val byName = rows.map(t => t._1 -> t).toMap
    // perfect copy of the label: MI = H(Y) = ln 2, ranked first
    assert(byName("perfect") == (("perfect", 4L, 2L, 2L, r6(math.log(2.0)), 1)))
    // constant feature: zero information, ranked last
    assert(byName("const")._5 == 0.0 && byName("const")._6 == 3)
    // NULL values excluded from the feature's OWN support only: n = 3,
    // and on its observed rows it still separates the label perfectly
    // (2 label values on the support) -> H(Y|support) = 2/3 vs 1/3
    assert(byName("sparse")._2 == 3L && byName("sparse")._3 == 2L)
    val hs = -(2.0 / 3.0) * math.log(2.0 / 3.0) -
      (1.0 / 3.0) * math.log(1.0 / 3.0)
    assert(math.abs(byName("sparse")._5 - hs) < 2e-6)
    assert(byName("sparse")._6 == 2)
    intercept[IllegalArgumentException] {
      Features.miRanking(df, Seq.empty, col("y"))
    }
    intercept[IllegalArgumentException] {
      Features.miRanking(df,
        Seq("a" -> col("const"), "a" -> col("const")), col("y"))
    }
  }
}
