package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, MapData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document term frequencies as one native expression: tokenize on
  * single spaces (identical to `split(text, ' ', -1)` — empty tokens from
  * leading/trailing/double spaces are counted, matching the SQL split
  * contract byte-for-byte) and count occurrences in a single pass,
  * returning `map<token, count>`.
  *
  * This collapses the classic TF pipeline prefix
  * `explode(split(text)) → groupBy(doc, token).count()` into per-row map
  * work: the explode materializes one row per token OCCURRENCE (~180
  * rows/doc on the test corpus) only for the hash aggregate to collapse
  * them back to one row per DISTINCT token (~100/doc). Emitting the map
  * and exploding it yields the aggregated (token, tf) rows directly —
  * no aggregation exchange, no hash-map probe per occurrence outside
  * codegen, ~45% fewer exploded rows. At 100 TB the win compounds: the
  * explode+groupBy form's partial aggregation buffers every distinct
  * (doc, token) pair per task, while this form's state is one small map
  * per row, freed immediately.
  *
  * Split on the raw UTF-8 bytes: 0x20 never occurs inside a multi-byte
  * UTF-8 sequence, so byte-splitting equals character-splitting. Token
  * slices share the parent byte array (zero copy) until handed to the
  * map. Counts are Long to match `count(lit(1))` downstream schemas.
  *
  * Oracle equivalence: engines reproduce this with their native
  * split+unnest+GROUP BY — values are exact integers, so any
  * formulation hash-matches.
  */
case class TokenTf(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "graft_token_tf"

  override def nullSafeEval(input: Any): Any =
    TokenTf.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TokenTf$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenTf =
    copy(child = newChild)
}

object TokenTf {

  def compute(s: UTF8String): MapData = {
    val bytes = s.getBytes
    // First-seen order; LinkedHashMap keeps output deterministic for a
    // given input regardless of hash seeding.
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var start = 0
    var i = 0
    val n = bytes.length
    while (i <= n) {
      if (i == n || bytes(i) == ' '.toByte) {
        val tok = UTF8String.fromBytes(bytes, start, i - start)
        val slot = counts.get(tok)
        if (slot == null) counts.put(tok, Array(1L)) else slot(0) += 1L
        start = i + 1
      }
      i += 1
    }
    val m = counts.size()
    val keys = new Array[Any](m)
    val values = new Array[Any](m)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey
      values(j) = e.getValue()(0)
      j += 1
    }
    ArrayBasedMapData(keys, values)
  }
}
