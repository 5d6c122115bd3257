package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded DISTINCT-bottom-k sketch buffer: an array-backed binary max-heap
  * holding at most `k` distinct longs — the mutable aggregation state of
  * [[BottomKDistinct]]. The root is the largest retained value, so the
  * admit test for a full sketch is a single O(1) comparison against the
  * root; only values that would actually enter the sketch pay the O(k)
  * linear dedup scan (k <= a few hundred for KMV — a cache-resident probe,
  * cheaper than maintaining a side hash set).
  *
  * This IS the KMV sketch state: `mergeFrom` (union + re-take bottom-k) is
  * exactly the partition-wise sketch merge a 1000-executor NDV computation
  * performs, and what q48 exists to demonstrate.
  */
final class BottomKHeap(val k: Int) {
  private[functions] val arr = new Array[Long](k)
  private[functions] var n = 0

  /** Largest value currently retained (heap root); only valid when n > 0. */
  def root: Long = arr(0)

  def size: Int = n

  private def contains(v: Long): Boolean = {
    var i = 0
    while (i < n) { if (arr(i) == v) return true; i += 1 }
    false
  }

  /** Admit `v` if it belongs to the k smallest distinct values seen. */
  def insert(v: Long): Unit = {
    if (n < k) {
      if (!contains(v)) {
        arr(n) = v
        n += 1
        // sift up (max-heap)
        var i = n - 1
        while (i > 0) {
          val p = (i - 1) >> 1
          if (arr(p) < arr(i)) {
            val t = arr(p); arr(p) = arr(i); arr(i) = t
            i = p
          } else i = 0
        }
      }
    } else if (v < arr(0) && !contains(v)) {
      arr(0) = v
      // sift down (max-heap)
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = l + 1
        var m = i
        if (l < n && arr(l) > arr(m)) m = l
        if (r < n && arr(r) > arr(m)) m = r
        if (m == i) done = true
        else {
          val t = arr(m); arr(m) = arr(i); arr(i) = t
          i = m
        }
      }
    }
  }

  def mergeFrom(o: BottomKHeap): Unit = {
    var i = 0
    while (i < o.n) { insert(o.arr(i)); i += 1 }
  }

  /** The sketch content in ascending order (element k is the k-th smallest
    * distinct value — the KMV estimator's h_(k)). */
  def sortedAscending: Array[Long] = {
    val out = java.util.Arrays.copyOf(arr, n)
    java.util.Arrays.sort(out)
    out
  }
}

/** `bottom_k_distinct(longCol, k)` -> array<long>: the k smallest DISTINCT
  * values, ascending — a K-Minimum-Values sketch as a native Catalyst
  * [[TypedImperativeAggregate]].
  *
  * Scale contract (the reason this exists, VERDICT r4 #1): the grouped
  * bottom-k formerly planned as `row_number() OVER (PARTITION BY grp ORDER
  * BY h)` — at 100x scale that sorts billions of distinct hashes inside <=5
  * group partitions (parallelism collapse + skew). As an aggregate, every
  * input partition folds its rows into a k-sized heap map-side (Partial
  * mode, ObjectHashAggregate), the shuffle carries #partitions x #groups
  * sketch buffers of at most k longs, and the Final merge unions heaps.
  * Nothing NDV-sized is ever sorted or shuffled, and no upstream
  * `distinct()` is needed — dedup happens inside the buffer.
  */
case class BottomKDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKHeap]
  with UnaryLike[Expression] {

  // k bound matches the cache-resident-probe design envelope documented on
  // BottomKHeap (ADVICE r5: the O(k) dedup scan per admitted insert is only
  // cheaper than a side hash set while the array stays cache-sized; KMV
  // accuracy needs k in the hundreds, so 64k is already generous headroom)
  require(k > 0 && k <= (1 << 16), s"bottom_k_distinct k=$k out of range")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bottom_k_distinct requires a BIGINT child, got ${child.dataType.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): BottomKHeap = new BottomKHeap(k)

  override def update(b: BottomKHeap, row: InternalRow): BottomKHeap = {
    val v = child.eval(row)
    if (v != null) b.insert(v.asInstanceOf[Long])
    b
  }

  override def merge(b: BottomKHeap, o: BottomKHeap): BottomKHeap = {
    b.mergeFrom(o)
    b
  }

  override def eval(b: BottomKHeap): Any = new GenericArrayData(b.sortedAscending)

  override def serialize(b: BottomKHeap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * b.n)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKHeap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val m = bb.getInt
    val h = new BottomKHeap(k)
    var i = 0
    while (i < m) { h.insert(bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BottomKDistinct =
    copy(child = c)
  override def prettyName: String = "bottom_k_distinct"
}

object BottomK {
  /** The k smallest distinct values of a long column, ascending. */
  def bottomKDistinct(c: Column, k: Int): Column =
    GraftShims.column(BottomKDistinct(GraftShims.expression(c), k).toAggregateExpression())
}
