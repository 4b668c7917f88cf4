package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge applied to a space-joined token string: every
  * left-to-right NON-OVERLAPPING occurrence of the adjacent token pair
  * `(left, right)` is replaced by the single token `left+joiner+right`.
  * Greedy-left semantics are the classic BPE contract — in `a a a` with
  * merge `(a,a)` the first two tokens fuse and the third survives
  * unpaired — and are exactly what a plain string `replace` CANNOT
  * express (a replace of `"a a"` inside `"xa a"` would fuse across a
  * token boundary; with separators padded in, each replacement consumes
  * the boundary the next match needs). Token-boundary-aware greedy
  * matching needs a real scanner, so it lives here as a native
  * expression: one pass over the token sequence per row, inside the
  * enclosing codegen stage, zero shuffle.
  *
  * `left`/`right`/`joiner` are construction-time constants (one merge
  * rule per operator round), not child expressions — the per-row work is
  * pure token comparison. */
case class BpeMergePair(child: Expression, left: String, right: String,
    joiner: String) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_bpe_merge"

  override def nullSafeEval(input: Any): Any =
    BpeMergePair.compute(input.asInstanceOf[UTF8String], left, right, joiner)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("bpeLeft", left, "java.lang.String")
    val r = ctx.addReferenceObj("bpeRight", right, "java.lang.String")
    val j = ctx.addReferenceObj("bpeJoiner", joiner, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.BpeMergePair$$.MODULE$$.compute($c, $l, $r, $j);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergePair =
    copy(child = newChild)
}

object BpeMergePair {

  def compute(s: UTF8String, left: String, right: String,
      joiner: String): UTF8String = {
    // -1 limit: trailing empty tokens are tokens too (split contract
    // shared with TokenTf / TextFunctions.tokens)
    val toks = s.toString.split(" ", -1)
    val out = new java.lang.StringBuilder(s.numBytes())
    var i = 0
    var first = true
    while (i < toks.length) {
      if (!first) out.append(' ')
      if (i + 1 < toks.length && toks(i) == left && toks(i + 1) == right) {
        out.append(left).append(joiner).append(right)
        i += 2
      } else {
        out.append(toks(i))
        i += 1
      }
      first = false
    }
    UTF8String.fromString(out.toString)
  }
}
