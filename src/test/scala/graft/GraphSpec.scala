package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** PageRank contracts: probability mass conservation, the known fixpoint
  * of a symmetric graph, dangling-mass redistribution, and flat plan
  * depth across iterations (the checkpoint discipline). */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ranks sum to ~1 and a symmetric cycle converges to uniform") {
    // 4-cycle with equal weights: PageRank is exactly uniform from the
    // first iteration onward.
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "d", 1L), ("d", "a", 1L))
      .toDF("src", "dst", "w")
    val r = Graph.pageRank(edges, "src", "dst", "w", iterations = 5).collect()
    assert(r.length == 4)
    r.foreach(row => assert(math.abs(row.getAs[Double]("rank") - 0.25) < 1e-9))
  }

  test("a sink node gains rank; total mass stays ~1 via dangling redistribution") {
    // star into a sink: 'hub' points at 'sink'; sink has no out-edges,
    // so its mass must be redistributed, not lost.
    val edges = Seq(("h1", "sink", 1L), ("h2", "sink", 1L), ("h3", "sink", 1L))
      .toDF("src", "dst", "w")
    val r = Graph.pageRank(edges, "src", "dst", "w", iterations = 10)
      .collect().map(row => row.getAs[String]("node") -> row.getAs[Double]("rank")).toMap
    val total = r.values.sum
    assert(math.abs(total - 1.0) < 1e-6, s"mass leaked: $total")
    assert(r("sink") > r("h1"), "the sink must out-rank its pointers")
    assert(math.abs(r("h1") - r("h2")) < 1e-12, "symmetric sources tie exactly")
  }

  test("weighted edges shift rank toward the heavier target") {
    val edges = Seq(("s", "heavy", 9L), ("s", "light", 1L),
      ("heavy", "s", 1L), ("light", "s", 1L)).toDF("src", "dst", "w")
    val r = Graph.pageRank(edges, "src", "dst", "w", iterations = 8)
      .collect().map(row => row.getAs[String]("node") -> row.getAs[Double]("rank")).toMap
    assert(r("heavy") > 2 * r("light"))
  }

  test("10 iterations keep the rank plan flat (checkpoint discipline)") {
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("src", "dst", "w")
    val r = Graph.pageRank(edges, "src", "dst", "w", iterations = 10)
    // a localCheckpoint'ed frame plans as a leaf scan: no join towers
    val depth = r.queryExecution.optimizedPlan.toString.linesIterator.size
    assert(depth < 10, s"plan depth grew with iterations:\n${r.queryExecution.optimizedPlan}")
    r.collect()
  }
}
