package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonical normalization as a native codegen'd expression
  * (the engine-side twin of DuckDB's `nfc_normalize`). Text that is not
  * canonically composed — combining sequences like e + U+0301 instead of
  * é — hashes apart from its composed twin, so exact dedup, shingle
  * fingerprints, and equality joins silently treat equal strings as
  * different; normalizing first is the standard hygiene pass.
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
  * answers "already NFC" for the overwhelmingly-ASCII common case, so
  * the composing pass (which allocates) runs only on rows that need it.
  * Returning the INPUT object on the fast path also keeps reference
  * equality cheap for downstream `=!=` comparisons.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got ${other.simpleString}")
    }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.NfcNormalize$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
