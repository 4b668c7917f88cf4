package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Itemsets

class ItemsetsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("coOccurrencePairs counts groups per canonical pair, dedups multiplicity") {
    val rows = Seq(
      (100L, "a"), (100L, "b"), (100L, "c"),
      (200L, "a"), (200L, "b"), (200L, "b"), // duplicate (200, b) collapses
      (300L, "b"), (300L, "a"),              // order within group irrelevant
      (400L, "c")                            // singleton group: no pairs
    ).toDF("order_id", "item")
    val out = Itemsets.coOccurrencePairs(rows, "order_id", "item", topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // (a,b) in 3 groups; (a,c) and (b,c) only in group 100
    assert(out.toList == List(("a", "b", 3L), ("a", "c", 1L), ("b", "c", 1L)))
  }

  test("coOccurrencePairs topK cuts on the (count desc, a, b) total order") {
    val rows = Seq(
      (1L, "x"), (1L, "y"), (1L, "z"), (2L, "x"), (2L, "y"))
      .toDF("g", "i")
    val out = Itemsets.coOccurrencePairs(rows, "g", "i", topK = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toList == List(("x", "y", 2L), ("x", "z", 1L)))
  }
}
