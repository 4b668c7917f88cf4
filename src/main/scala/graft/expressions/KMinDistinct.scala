package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The k smallest DISTINCT string values of the input, as a sorted array —
  * the aggregation core of a KMV (k-minimum-values) distinct-cardinality
  * sketch (Bar-Yossef et al. 2002, "Counting distinct elements in a data
  * stream"). Feed it a uniform hash (`md5(x)`) and the k-th smallest
  * hash's position in [0,1) estimates the distinct count as `(k-1)/frac`;
  * with fewer than k distinct hashes the array length IS the exact count.
  *
  * Why not `count(distinct x)`: exact distinct re-shuffles the DATA (one
  * exchange per distinct aggregate via Expand, state proportional to the
  * number of distinct values per group). This buffer is bounded at k
  * entries no matter how many distinct values stream through a 100 TB
  * group, it partial-aggregates map-side like any sum, and two sketches
  * merge by set-union-then-truncate — the properties that let a
  * 1000-executor cardinality estimate finish in one pass with one narrow
  * exchange of k×32-byte rows per group.
  *
  * Determinism: "k smallest distinct" is order-independent, so the result
  * is identical across partitionings and retries, and any ANSI engine
  * reproduces it (`list_sort(list_distinct(list(h)))[1:k]` in the
  * oracle) — unlike HyperLogLog sketches, whose layout is
  * engine-private.
  *
  * Buffer: a TreeSet of the current k minima. Values are cloned on
  * insert (the incoming UTF8String aliases the scan's reused row
  * buffer); a candidate ≥ the current max of a full buffer is rejected
  * without allocation, so a sorted-ascending adversarial stream costs
  * one compare per row after warm-up.
  */
case class KMinDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[UTF8String]]
  with UnaryLike[Expression] {

  require(k > 0, s"k must be positive: $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmin_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[UTF8String] =
    new java.util.TreeSet[UTF8String]()

  override def update(buf: java.util.TreeSet[UTF8String], input: InternalRow):
      java.util.TreeSet[UTF8String] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      // contains-check BEFORE cloning: a duplicate row must not pay the
      // copy (the hottest path of a low-cardinality exact-count group)
      if (buf.size < k) { if (!buf.contains(s)) buf.add(s.clone()) }
      else if (s.compareTo(buf.last()) < 0 && !buf.contains(s)) {
        buf.pollLast()
        buf.add(s.clone())
      }
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[UTF8String],
      other: java.util.TreeSet[UTF8String]): java.util.TreeSet[UTF8String] = {
    val it = other.iterator()
    var continue = true
    while (continue && it.hasNext) {
      val s = it.next()
      if (buf.size < k) buf.add(s)
      else if (s.compareTo(buf.last()) < 0) {
        if (!buf.contains(s)) { buf.pollLast(); buf.add(s) }
      } else continue = false // other is sorted: the rest are all ≥ max
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[UTF8String]): Any =
    new GenericArrayData(buf.toArray[AnyRef](new Array[AnyRef](buf.size)))

  override def serialize(buf: java.util.TreeSet[UTF8String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val b = it.next().getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[UTF8String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new java.util.TreeSet[UTF8String]()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.add(UTF8String.fromBytes(b))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KMinDistinct =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KMinDistinct =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KMinDistinct =
    copy(child = newChild)
}

/** Sketch-of-sketches: [[KMinDistinct]] whose input is an ARRAY of hash
  * strings — each element updates the buffer. Because "k smallest
  * distinct" of a union equals "k smallest distinct" of the union of
  * per-part k-minima, re-aggregating stored sketch arrays with this
  * aggregate yields EXACTLY the sketch of the concatenated raw data —
  * the property that makes KMV sketches incrementally maintainable
  * (store a bounded array per batch partition, merge at read time;
  * see [[graft.operators.IncrementalAgg.mergePartialsWithDistinct]]). */
case class KMinDistinctMerge(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[UTF8String]]
  with UnaryLike[Expression] {

  require(k > 0, s"k must be positive: $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmin_distinct_merge"

  private val scalar = KMinDistinct(child, k)

  override def createAggregationBuffer(): java.util.TreeSet[UTF8String] =
    new java.util.TreeSet[UTF8String]()

  override def update(buf: java.util.TreeSet[UTF8String], input: InternalRow):
      java.util.TreeSet[UTF8String] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        val s = arr.getUTF8String(i)
        if (s != null) {
          if (buf.size < k) { if (!buf.contains(s)) buf.add(s.clone()) }
          else if (s.compareTo(buf.last()) < 0 && !buf.contains(s)) {
            buf.pollLast()
            buf.add(s.clone())
          }
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[UTF8String],
      other: java.util.TreeSet[UTF8String]): java.util.TreeSet[UTF8String] =
    scalar.merge(buf, other)
  override def eval(buf: java.util.TreeSet[UTF8String]): Any = scalar.eval(buf)
  override def serialize(buf: java.util.TreeSet[UTF8String]): Array[Byte] =
    scalar.serialize(buf)
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[UTF8String] =
    scalar.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): KMinDistinctMerge =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KMinDistinctMerge =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KMinDistinctMerge =
    copy(child = newChild)
}
