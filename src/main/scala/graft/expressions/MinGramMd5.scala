package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing-style rolling fingerprint: the lexicographic min of
  * `md5(substring(text, i, gram))` over every character position — as one
  * native expression.
  *
  * The HOF formulation (`array_min(transform(sequence(...), i =>
  * md5(substr(text, i, gram))))`) materializes an index array plus a
  * length-n hex-string array per row and interprets the lambda per
  * element outside whole-stage codegen; for a 1,000-char document that is
  * ~1,000 interpreted expression evaluations and ~64 KB of transient
  * strings. This expression runs a tight digest loop inside the enclosing
  * codegen stage: one reusable MessageDigest, a byte-window slide on the
  * ASCII fast path (no substring allocation), digests compared as
  * unsigned bytes, hex-encoded once at the end.
  *
  * Output is identical to `md5()`-based SQL (lowercase hex over UTF-8
  * bytes), so DuckDB's `list_min([md5(substring(text, i, g)) ...])`
  * reproduces it exactly.
  */
case class MinGramMd5(child: Expression, gram: Int) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_min_gram_md5"

  override def nullSafeEval(input: Any): Any =
    MinGramMd5.compute(input.asInstanceOf[UTF8String], gram)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.MinGramMd5$$.MODULE$$.compute($c, $gram);")

  override protected def withNewChildInternal(newChild: Expression): MinGramMd5 =
    copy(child = newChild)
}

object MinGramMd5 {

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Unsigned lexicographic byte compare — the byte-level equivalent of
    * comparing the hex renderings. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  def compute(s: UTF8String, gram: Int): UTF8String = {
    val md = MessageDigest.getInstance("MD5")
    val nChars = s.numChars()
    val n = math.max(nChars - gram + 1, 1)
    // Pure-ASCII fast path: byte offsets == char offsets, slide a window
    // over the raw UTF-8 bytes with zero per-gram allocation.
    val asciiBytes = if (s.numBytes() == nChars) s.getBytes else null
    var best: Array[Byte] = null
    var i = 0
    while (i < n) {
      md.reset()
      if (asciiBytes != null)
        md.update(asciiBytes, i, math.min(gram, asciiBytes.length - i))
      else {
        val sub = s.substringSQL(i + 1, gram)
        md.update(sub.getBytes)
      }
      val dig = md.digest()
      if (best == null || less(dig, best)) best = dig
      i += 1
    }
    val out = new Array[Char](32)
    var j = 0
    while (j < 16) {
      out(j * 2) = hexDigits((best(j) >> 4) & 0xf)
      out(j * 2 + 1) = hexDigits(best(j) & 0xf)
      j += 1
    }
    UTF8String.fromString(new String(out))
  }
}
