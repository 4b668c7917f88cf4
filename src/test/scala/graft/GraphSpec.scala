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

  test("triangleStats counts a known graph exactly, any edge orientation") {
    // K4 minus one edge on {1,2,3,4}: triangles {1,2,3} and {1,2,4};
    // edges given in MIXED orientation to exercise canonicalization.
    val edges = Seq((1L, 2L), (3L, 1L), (2L, 3L), (4L, 1L), (2L, 4L))
      .toDF("u", "v")
    val r = Graph.triangleStats(edges, "u", "v")
      .collect().map(x => x.getAs[Long]("node") ->
        (x.getAs[Long]("degree"), x.getAs[Long]("n_triangles"),
          Option(x.getAs[java.lang.Double]("clustering")).map(_.doubleValue))).toMap
    assert(r(1L) == ((3L, 2L, Some(round6(2.0 * 2 / (3 * 2))))))
    assert(r(2L) == ((3L, 2L, Some(round6(2.0 * 2 / (3 * 2))))))
    assert(r(3L) == ((2L, 1L, Some(1.0))))
    assert(r(4L) == ((2L, 1L, Some(1.0))))
  }
  private def round6(d: Double) =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("triangleStats fails fast on a hub above maxDegree") {
    val hub = (1 to 20).map(i => (0L, i.toLong)).toDF("u", "v")
    val ex = intercept[Exception] {
      Graph.triangleStats(hub, "u", "v", maxDegree = 10).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("maxDegree")))
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
