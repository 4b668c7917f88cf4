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

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
