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
}
