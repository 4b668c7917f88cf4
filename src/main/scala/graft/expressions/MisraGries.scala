package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary (Misra & Gries 1982) over string
  * keys, with the mergeable-summaries combine step (Agarwal et al. 2012,
  * "Mergeable summaries"): at most `k` counters no matter how many
  * distinct keys stream through, and the candidate set is GUARANTEED to
  * contain every key whose true count exceeds N/(k+1).
  *
  * Why not `groupBy(key).count()`: the exact form shuffles one row per
  * distinct key — at 100 TB that is the full key cardinality through the
  * exchange just to find the handful of heavy keys. This buffer is
  * bounded at k entries, partial-aggregates map-side, and merges
  * associatively, so the candidate pass costs one narrow exchange of
  * ≤ k small rows per group. The summary's counts are stream-order
  * dependent (NOT portable across engines), so the operator built on it
  * ([[graft.operators.Profiling.heavyHitters]]) emits only the candidate
  * KEYS and re-counts them exactly in a second bounded pass — the
  * deterministic, oracle-reproducible production shape.
  *
  * Update: hit → +1; miss with free slot → insert 1; miss when full →
  * decrement ALL by 1 and drop zeros. The decrement-all step destroys k
  * units of count mass and total mass added is N, so it runs at most
  * N/k times — amortized O(1) per row. Merge: sum counts pairwise, then
  * if over k entries subtract the (k+1)-th largest count from all and
  * drop non-positives (the Agarwal et al. combine, which preserves the
  * N/(k+1) guarantee).
  *
  * Values are cloned on insert (the incoming UTF8String aliases the
  * scan's reused row buffer — the [[KMinDistinct]] lesson). */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0, s"k must be positive: $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_misra_gries"

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, java.lang.Long] =
    new java.util.HashMap[UTF8String, java.lang.Long]()

  override def update(buf: java.util.HashMap[UTF8String, java.lang.Long],
      input: InternalRow): java.util.HashMap[UTF8String, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      val cur = buf.get(key)
      if (cur != null) { buf.put(key, java.lang.Long.valueOf(cur + 1L)): Unit }
      else if (buf.size < k) { buf.put(key.clone(), java.lang.Long.valueOf(1L)): Unit }
      else {
        // miss when full: the classic decrement-all-by-1, dropping zeros
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val nv = e.getValue - 1L
          if (nv <= 0L) it.remove() else e.setValue(java.lang.Long.valueOf(nv)): Unit
        }
      }
    }
    buf
  }

  override def merge(buf: java.util.HashMap[UTF8String, java.lang.Long],
      other: java.util.HashMap[UTF8String, java.lang.Long]):
      java.util.HashMap[UTF8String, java.lang.Long] = {
    // pairwise sum (keys from `other` are already owned copies)
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      if (cur != null) buf.put(e.getKey, java.lang.Long.valueOf(cur + e.getValue)): Unit
      else buf.put(e.getKey, e.getValue): Unit
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from all, drop non-positive
      val counts = new Array[Long](buf.size)
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(buf.size - k - 1) // (k+1)-th largest
      val eit = buf.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        val nv = e.getValue - cut
        if (nv <= 0L) eit.remove() else e.setValue(java.lang.Long.valueOf(nv)): Unit
      }
    }
    buf
  }

  /** Candidate keys, sorted — the counts are deliberately NOT emitted:
    * they are stream-order noise; the caller re-counts exactly. */
  override def eval(buf: java.util.HashMap[UTF8String, java.lang.Long]): Any = {
    val arr = buf.keySet().toArray[AnyRef](new Array[AnyRef](buf.size))
    java.util.Arrays.sort(arr, null)
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.HashMap[UTF8String, java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new java.util.HashMap[UTF8String, java.lang.Long]()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.put(UTF8String.fromBytes(b), java.lang.Long.valueOf(in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGries =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGries =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}
