package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** TRUE (unrestricted) Damerau–Levenshtein edit distance as a native
  * codegen'd expression — Levenshtein plus adjacent-transposition as a
  * single edit, where a transposed pair may be edited again later
  * ("CA"→"ABC" = 2, not the 3 the restricted/OSA variant returns).
  * Spark ships only `levenshtein`; the transposition-aware distance is
  * the right comparator for keyed identifiers and names whose dominant
  * human error is a character swap.
  *
  * Semantics match DuckDB's `damerau_levenshtein` cell-for-cell (the
  * oracle for q244): verified on the OSA-vs-DL discriminator
  * ("CA"/"ABC" → 2), swaps ("ab"/"ba" → 1), and the Levenshtein
  * fallback cases ("kitten"/"sitting" → 3).
  *
  * Algorithm: Lowrance–Wagner (JACM 1975) with the last-occurrence
  * row map and the (i−k−1)+1+(j−l−1) transposition recurrence —
  * O(|a|·|b|) time and space per pair. Like [[JaroWinkler]], this is
  * a BLOCKED-pairs comparator by contract (EntityResolution-style
  * candidate frames of short strings), so the full matrix stays tiny;
  * a Scala UDF here would box every pair and break whole-stage
  * codegen in the one loop that dominates the stage.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_damerau_levenshtein"

  override def nullSafeEval(l: Any, r: Any): Any =
    DamerauLevenshtein.compute(l.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.DamerauLevenshtein$$.MODULE$$" +
        s".compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {
  def compute(a: UTF8String, b: UTF8String): Int = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0) return l2
    if (l2 == 0) return l1
    val inf = l1 + l2
    // d is (l1+2) x (l2+2) with a sentinel border row/column of `inf`
    val w = l2 + 2
    val d = new Array[Int]((l1 + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= l1) { d((i + 1) * w) = inf; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= l2) { d(j + 1) = inf; d(w + j + 1) = j; j += 1 }
    val last = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= l1) {
      var db = 0
      j = 1
      while (j <= l2) {
        val k: Int = {
          val v = last.get(s2.charAt(j - 1)); if (v == null) 0 else v
        }
        val l = db
        val cost = if (s1.charAt(i - 1) == s2.charAt(j - 1)) {
          db = j; 0
        } else 1
        val subst = d(i * w + j) + cost
        val insert = d((i + 1) * w + j) + 1
        val delete = d(i * w + j + 1) + 1
        val transp = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var best = subst
        if (insert < best) best = insert
        if (delete < best) best = delete
        if (transp < best) best = transp
        d((i + 1) * w + j + 1) = best
        j += 1
      }
      last.put(s1.charAt(i - 1), i)
      i += 1
    }
    d((l1 + 1) * w + l2 + 1)
  }
}
