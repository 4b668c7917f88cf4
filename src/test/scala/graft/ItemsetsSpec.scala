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

  test("coOccurrenceEdges matches the pair semantics without the cut, " +
    "honors minGroups, fail-fasts a mega-basket") {
    val rows = Seq(
      (100L, "a"), (100L, "b"), (100L, "c"),
      (200L, "a"), (200L, "b"), (200L, "b"),
      (300L, "b"), (300L, "a"),
      (400L, "c")
    ).toDF("order_id", "item")
    val out = Itemsets.coOccurrenceEdges(rows, "order_id", "item")
      .orderBy("item_a", "item_b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toList == List(("a", "b", 3L), ("a", "c", 1L), ("b", "c", 1L)))
    val thresholded = Itemsets.coOccurrenceEdges(rows, "order_id", "item",
        minGroups = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(thresholded.toList == List(("a", "b", 3L)))
    val ex = intercept[Exception] {
      Itemsets.coOccurrenceEdges(rows, "order_id", "item",
        maxBasket = 2).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("maxBasket")))
  }

  test("coOccurrenceEdgesPacked: identical answer to the struct form; " +
    "out-of-range keys fail fast naming the generic fallback") {
    val rows = Seq(
      (100L, 5L), (100L, 9L), (100L, 12L),
      (200L, 5L), (200L, 9L), (200L, 9L),
      (300L, 9L), (300L, 5L),
      (400L, 12L)
    ).toDF("order_id", "item")
    val packed = Itemsets.coOccurrenceEdgesPacked(rows, "order_id", "item")
      .orderBy("item_a", "item_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val struct = Itemsets.coOccurrenceEdges(rows, "order_id", "item")
      .orderBy("item_a", "item_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(packed.toList == struct.toList &&
      packed.toList == List((5L, 9L, 3L), (5L, 12L, 1L), (9L, 12L, 1L)))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val big = Seq((1L, 5L), (1L, 1L << 31)).toDF("order_id", "item")
    val ex = intercept[Exception] {
      Itemsets.coOccurrenceEdgesPacked(big, "order_id", "item").collect()
    }
    assert(msgs(ex).exists(_.contains("coOccurrenceEdges (struct keys)")))
    val neg = Seq((1L, 5L), (1L, -2L)).toDF("order_id", "item")
    val ex2 = intercept[Exception] {
      Itemsets.coOccurrenceEdgesPacked(neg, "order_id", "item").collect()
    }
    assert(msgs(ex2).exists(_.contains("coOccurrenceEdges (struct keys)")))
    // Round-15 ADVICE: non-integral item columns must get the same
    // curated message AT CALL TIME, not a raw ANSI CAST error mid-job.
    val strs = Seq((1L, "a"), (1L, "b")).toDF("order_id", "item")
    val ex3 = intercept[IllegalArgumentException] {
      Itemsets.coOccurrenceEdgesPacked(strs, "order_id", "item")
    }
    assert(ex3.getMessage.contains("coOccurrenceEdges (struct keys)") &&
      ex3.getMessage.contains("StringType"))
  }

  test("coOccurrencePairs topK cuts on the (count desc, a, b) total order") {
    val rows = Seq(
      (1L, "x"), (1L, "y"), (1L, "z"), (2L, "x"), (2L, "y"))
      .toDF("g", "i")
    val out = Itemsets.coOccurrencePairs(rows, "g", "i", topK = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toList == List(("x", "y", 2L), ("x", "z", 1L)))
  }

  test("associationRules: hand metrics, direction asymmetry, minCount") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // N = 4 baskets: {a,b} x3, {a} x1 -> c_a = 4, c_b = 3, c_ab = 3
    val rows = Seq(
      (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"), (3L, "b"),
      (4L, "a")).toDF("g", "i")
    val out = Itemsets.associationRules(rows, "g", "i",
        minCount = 1L, topK = 10)
      .collect().map(r => (r.getString(1), r.getString(0), r))
    val ab = out.collectFirst { case ("b", "a", r) => r }.get  // a -> b
    val ba = out.collectFirst { case ("a", "b", r) => r }.get  // b -> a
    // a -> b: conf 3/4, lift 3*4/(4*3) = 1, conviction (1-3/4)/(1-3/4)=1
    assert(ab.getLong(2) == 3 && ab.getDouble(4) == 0.75)
    assert(ab.getDouble(5) == 1.0 && ab.getDouble(6) == 1.0)
    // b -> a: conf 1 -> conviction NULL; support 3/4 both directions
    assert(ba.getDouble(4) == 1.0 && ba.isNullAt(6))
    assert(ba.getDouble(3) == 0.75 && ab.getDouble(3) == 0.75)
    // minCount prunes the pair before doubling
    val pruned = Itemsets.associationRules(rows, "g", "i",
      minCount = 4L, topK = 10).collect()
    assert(pruned.isEmpty)
    // lift > 1 for positively associated pair
    val pos = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "z"))
      .toDF("g", "i")
    val rp = Itemsets.associationRules(pos, "g", "i", 1L, 10)
      .collect().head
    assert(rp.getDouble(5) == r6(2.0 * 3 / (2.0 * 2)))
  }
}
