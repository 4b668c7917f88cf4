package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DataQuality
import graft.operators.DataQuality._

/** Every check kind exercised once passing and once failing, plus the
  * NULL / empty-input contracts the scaladoc promises. */
class DataQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def report(df: org.apache.spark.sql.DataFrame,
      checks: Seq[Check]): Map[String, (Double, Boolean)] =
    DataQuality.validate(df, checks).collect()
      .map(r => r.getString(0) ->
        ((if (r.isNullAt(2)) Double.NaN else r.getDouble(2)),
          r.getBoolean(4)))
      .toMap

  test("planted violations land in the right checks with exact counts") {
    import spark.implicits._
    // id 3 duplicated; one NULL fk; fk 99 orphaned; id 3 maps to two
    // dates; price -5 out of range; status X out of set
    val ref = Seq(1L, 2L).toDF("pk")
    val df = Seq(
      (1L, Some(1L), 10.0, "O", "2024-01-01"),
      (2L, Some(2L), -5.0, "F", "2024-01-02"),
      (3L, Some(99L), 20.0, "X", "2024-01-03"),
      (3L, None, 30.0, "O", "2024-01-04")
    ).toDF("id", "fk", "price", "status", "day")
    val got = report(df, Seq(
      Completeness("comp", col("fk"), 1.0),
      Uniqueness("uniq", Seq("id")),
      ValueRange("range", col("price"), 0.0, 100.0),
      InSet("set", col("status"), Seq("O", "F")),
      RowCountBetween("rows", 1L, 3L),
      Referential("ref", col("fk"), ref, col("pk")),
      FunctionalDep("fd", Seq("id"), col("day"))))
    assert(got("comp") == ((0.75, false)))
    assert(got("uniq") == ((1.0, false))) // one duplicated key group
    assert(got("range") == ((1.0, false))) // the -5
    assert(got("set") == ((1.0, false))) // the X
    assert(got("rows") == ((4.0, false))) // 4 > hi=3
    assert(got("ref") == ((1.0, false))) // fk 99; NULL fk NOT counted
    assert(got("fd") == ((1.0, false))) // id 3 → two days
  }

  test("clean frame passes every kind; NULLs exempt from domain checks") {
    import spark.implicits._
    val ref = Seq(1L, 2L).toDF("pk")
    val df = Seq(
      (1L, Some(1L), 10.0, Some("O"), "2024-01-01"),
      (2L, Some(2L), 20.0, None, "2024-01-02")
    ).toDF("id", "fk", "price", "status", "day")
    val got = report(df, Seq(
      Completeness("comp", col("fk"), 0.9),
      Uniqueness("uniq", Seq("id")),
      ValueRange("range", col("price"), 0.0, 100.0),
      InSet("set", col("status"), Seq("O", "F")), // NULL status exempt
      RowCountBetween("rows", 1L, 10L),
      Referential("ref", col("fk"), ref, col("pk")),
      FunctionalDep("fd", Seq("id"), col("day"))))
    assert(got.values.forall(_._2), s"expected all passed: $got")
    assert(got("comp")._1 == 1.0 && got("rows")._1 == 2.0)
  }

  test("completeness gate uses the unrounded ratio") {
    import spark.implicits._
    // 2999999/3000000 rounds to 1.0 at 6dp but must still FAIL a 1.0 gate
    // — simulate with 999999/1000000-style small frame: 7 of 8 non-null
    // gives ratio 0.875; gate 0.875 passes, gate 0.8750001 fails
    val df = (1 to 8).map(i => (i.toLong, if (i == 8) None else Some(i)))
      .toDF("id", "v")
    val pass = report(df, Seq(Completeness("c", col("v"), 0.875)))
    val fail = report(df, Seq(Completeness("c", col("v"), 0.8750001)))
    assert(pass("c")._2 && !fail("c")._2)
  }

  test("empty frame: completeness vacuously true with NULL observed") {
    import spark.implicits._
    val df = Seq.empty[(Long, Option[Long])].toDF("id", "v")
    val rows = DataQuality.validate(df, Seq(
      Completeness("comp", col("v"), 1.0),
      RowCountBetween("rows", 1L, 10L))).collect()
    val comp = rows.find(_.getString(0) == "comp").get
    assert(comp.isNullAt(2) && comp.getBoolean(4))
    val rc = rows.find(_.getString(0) == "rows").get
    assert(rc.getDouble(2) == 0.0 && !rc.getBoolean(4)) // 0 < lo
  }

  test("duplicate check names rejected up front") {
    import spark.implicits._
    val df = Seq((1L, 1L)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      DataQuality.validate(df, Seq(
        RowCountBetween("x", 1L, 2L), RowCountBetween("x", 1L, 3L)))
    }
    intercept[IllegalArgumentException] {
      DataQuality.validate(df, Seq.empty)
    }
  }
}
