package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro (and Jaro–Winkler) string similarity as one native codegen'd
  * expression — the fuzzy comparator record linkage wants for NAME-like
  * fields, where edit distance over-penalizes transpositions ("MARTHA"
  * vs "MARHTA" is 2 edits but clearly the same person).
  *
  * Semantics follow the standard definition as DuckDB/rapidfuzz ship it
  * (so an external oracle agrees cell-for-cell):
  *
  *  - match window `max(|a|,|b|)/2 − 1` (floor, min 0); transpositions
  *    are half the out-of-order matched pairs;
  *  - `jaro = (m/|a| + m/|b| + (m−t)/m) / 3`; 0 when either side is
  *    empty (INCLUDING both-empty — the DuckDB convention, not the
  *    "two empties are equal" one) or when m = 0;
  *  - the Winkler prefix boost `jaro + ℓ·0.1·(1−jaro)` (common prefix
  *    ℓ capped at 4) applies only when `jaro > 0.7` (the standard
  *    boost threshold).
  *
  * A Scala UDF here would box both strings per pair and fall out of
  * whole-stage codegen — on a blocked-pairs frame (the only shape this
  * should run in, see [[graft.operators.EntityResolution]]) the
  * comparator IS the hot loop. The kernel runs on the decoded char
  * sequence with two bitset-free boolean scratch arrays, O(|a|·window)
  * time, O(|a|+|b|) scratch per call.
  */
case class JaroWinkler(left: Expression, right: Expression,
    winkler: Boolean = true) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String =
    if (winkler) "graft_jaro_winkler" else "graft_jaro"

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.compute(l.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String], winkler)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.JaroWinkler$$.MODULE$$" +
        s".compute($a, $b, $winkler);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  def compute(a: UTF8String, b: UTF8String, winkler: Boolean): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val mt = t / 2
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - mt) / md) / 3.0
    if (!winkler || jaro <= 0.7) jaro
    else {
      val maxL = math.min(4, math.min(l1, l2))
      var l = 0
      while (l < maxL && s1.charAt(l) == s2.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }
}
