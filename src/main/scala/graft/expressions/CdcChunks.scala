package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking: split text into variable-size chunks whose
  * boundaries depend on CONTENT, not position — after any character
  * position `i ≥ window` where the digest of the `window`-char sequence
  * ending at `i` has its first `maskHexZeros` hex digits zero
  * (boundary probability 16^-maskHexZeros per position, so the expected
  * chunk length is 16^maskHexZeros). Content-anchored boundaries are
  * the storage-dedup classic (LBFS/Muthitacharoen et al. 2001; gear/
  * FastCDC in modern backup systems): insert one byte into a document
  * and fixed-size chunking shifts EVERY later chunk, while CDC re-syncs
  * at the next content boundary — so chunk-level dedup still matches
  * everything downstream of the edit.
  *
  * The hash is md5 (not gear/rabin) deliberately: md5-hex is the
  * repo's portable-hash convention, so an ANSI oracle reproduces every
  * boundary with `substring(md5(substring(text, i-w+1, w)), 1, z) =
  * '0…'`. One reused MessageDigest and a byte-window slide on the
  * ASCII fast path, inside the enclosing codegen stage — the same
  * shape as [[MinGramMd5]]. Empty chunks (adjacent boundaries, or a
  * boundary at end-of-text) are dropped. */
case class CdcChunks(child: Expression, window: Int, maskHexZeros: Int)
  extends UnaryExpression {

  require(window > 0, s"window must be positive: $window")
  require(maskHexZeros >= 1 && maskHexZeros <= 8,
    s"maskHexZeros in [1,8]: $maskHexZeros")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[UTF8String], window, maskHexZeros)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.CdcChunks$$.MODULE$$.compute($c, $window, $maskHexZeros);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {

  /** First `z` hex digits of the digest are zero ⟺ the first
    * ceil(z/2) bytes' relevant nibbles are zero. */
  private def masked(dig: Array[Byte], z: Int): Boolean = {
    var i = 0
    while (i < z) {
      val nibble =
        if (i % 2 == 0) (dig(i / 2) >> 4) & 0xf else dig(i / 2) & 0xf
      if (nibble != 0) return false
      i += 1
    }
    true
  }

  def compute(s: UTF8String, w: Int, z: Int): GenericArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val nChars = s.numChars()
    val asciiBytes = if (s.numBytes() == nChars) s.getBytes else null
    val chunks = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var start = 0 // chunk start (0-based char offset)
    var i = w     // boundary candidate: window ends at char i (1-based)
    while (i <= nChars) {
      md.reset()
      if (asciiBytes != null) md.update(asciiBytes, i - w, w)
      else md.update(s.substringSQL(i - w + 1, w).getBytes)
      if (masked(md.digest(), z)) {
        if (i > start) {
          chunks += (if (asciiBytes != null)
            UTF8String.fromBytes(asciiBytes, start, i - start)
          else s.substringSQL(start + 1, i - start))
          start = i
        }
      }
      i += 1
    }
    if (nChars > start)
      chunks += (if (asciiBytes != null)
        UTF8String.fromBytes(asciiBytes, start, nChars - start)
      else s.substringSQL(start + 1, nChars - start))
    new GenericArrayData(chunks.toArray[Any])
  }
}
