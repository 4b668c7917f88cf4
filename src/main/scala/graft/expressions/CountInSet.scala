package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of array elements contained in a STATIC string set, duplicates
  * counted — the language-ID marker-hit counter as one native expression.
  *
  * The HOF formulation (`size(filter(tokens, x -> array_contains(markers,
  * x)))`) interprets the lambda per element outside whole-stage codegen
  * and rescans the marker ARRAY linearly per token — tokens × markers
  * comparisons per row, repeated per language scored. This expression
  * probes one prebuilt hash set per token inside the enclosing codegen
  * stage: tokens × O(1) per language.
  *
  * Semantics match the HOF form: null elements are not counted (a null
  * never equals a marker), a null array yields null.
  */
case class CountInSet(child: Expression, items: Seq[String]) extends UnaryExpression {

  // Analysis-time type gate: without this, an array<int> child reaches
  // execution where UnsafeArrayData.getUTF8String reinterprets raw slots
  // into garbage counts instead of failing the query at analysis.
  // (ExpectsInputTypes would be the idiomatic spelling, but
  // AbstractDataType is private[sql] in Spark 4, so the check is spelled
  // directly.)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> input, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_count_in_set"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](items.size * 2)
    items.foreach(i => s.add(UTF8String.fromString(i)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    CountInSet.compute(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("inSet", set, classOf[java.util.HashSet[_]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.CountInSet$$.MODULE$$.compute($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): CountInSet =
    copy(child = newChild)
}

object CountInSet {
  def compute(arr: ArrayData, set: java.util.HashSet[UTF8String]): Long = {
    var count = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) count += 1
      i += 1
    }
    count
  }
}
