package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k pair buffer: parallel arrays holding at most `k`
  * (sort_key, payload) long pairs as a binary MIN-heap ordered
  * lexicographically — the root is the smallest retained pair, so the
  * admit test for a full buffer is one O(1) comparison. The mutable
  * aggregation state of [[TopKPairs]]; `mergeFrom` (union + re-take
  * top-k) is the partition-wise merge a 1000-executor grouped top-k
  * performs.
  */
final class TopKPairHeap(val k: Int) {
  private[functions] val key = new Array[Long](k)
  private[functions] val pay = new Array[Long](k)
  private[functions] var n = 0

  @inline private def less(k1: Long, p1: Long, k2: Long, p2: Long): Boolean =
    k1 < k2 || (k1 == k2 && p1 < p2)

  private def swap(i: Int, j: Int): Unit = {
    val tk = key(i); key(i) = key(j); key(j) = tk
    val tp = pay(i); pay(i) = pay(j); pay(j) = tp
  }

  /** Admit (sk, p) if it ranks among the k largest pairs seen. */
  def insert(sk: Long, p: Long): Unit = {
    if (n < k) {
      key(n) = sk; pay(n) = p
      n += 1
      var i = n - 1
      while (i > 0) {
        val par = (i - 1) >> 1
        if (less(key(i), pay(i), key(par), pay(par))) { swap(i, par); i = par }
        else i = 0
      }
    } else if (less(key(0), pay(0), sk, p)) {
      key(0) = sk; pay(0) = p
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = l + 1
        var m = i
        if (l < n && less(key(l), pay(l), key(m), pay(m))) m = l
        if (r < n && less(key(r), pay(r), key(m), pay(m))) m = r
        if (m == i) done = true else { swap(i, m); i = m }
      }
    }
  }

  def mergeFrom(o: TopKPairHeap): Unit = {
    var i = 0
    while (i < o.n) { insert(o.key(i), o.pay(i)); i += 1 }
  }

  /** The retained pairs ordered DESCENDING by (sort_key, payload) — rank 1
    * first, the order a top-k result reads in. */
  def sortedDescending: Array[(Long, Long)] = {
    val out = Array.tabulate(n)(i => (key(i), pay(i)))
    scala.util.Sorting.stableSort(out,
      (a: (Long, Long), b: (Long, Long)) =>
        a._1 > b._1 || (a._1 == b._1 && a._2 > b._2))
    out
  }
}

/** `top_k_pairs(sortKey, payload, k)` -> array<struct<sort_key, payload>>
  * (descending): the k largest (sort_key, payload) pairs per group, as a
  * native Catalyst [[TypedImperativeAggregate]].
  *
  * Scale contract: the textbook grouped top-k is `row_number() OVER
  * (PARTITION BY grp ORDER BY score DESC) <= k` — at 100x scale WindowExec
  * sorts every group's FULL row set inside #groups partitions (parallelism
  * collapse on few groups, full-data sort-shuffle always). As an aggregate,
  * every input partition folds its rows into a k-sized heap map-side
  * (Partial mode under ObjectHashAggregate), the shuffle carries
  * #partitions x #groups buffers of at most k pairs, and the Final merge
  * unions heaps — data-sized rows are never sorted and never shuffled.
  * Payload ties are impossible when the payload is a row id, which also
  * makes the result deterministic and hash-gateable (the q46/q53 contract:
  * no engine-private state, the oracle's window formulation must agree
  * pair-for-pair).
  */
case class TopKPairs(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairHeap]
  with BinaryLike[Expression] {

  require(k > 0 && k <= (1 << 16), s"top_k_pairs k=$k out of range")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k_pairs requires BIGINT children, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  private val structType = StructType(Seq(
    StructField("sort_key", LongType, nullable = false),
    StructField("payload", LongType, nullable = false)))

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKPairHeap = new TopKPairHeap(k)

  override def update(b: TopKPairHeap, row: InternalRow): TopKPairHeap = {
    val sk = left.eval(row)
    val p = right.eval(row)
    if (sk != null && p != null) b.insert(sk.asInstanceOf[Long], p.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKPairHeap, o: TopKPairHeap): TopKPairHeap = {
    b.mergeFrom(o)
    b
  }

  override def eval(b: TopKPairHeap): Any =
    new GenericArrayData(b.sortedDescending.map { case (sk, p) =>
      InternalRow(sk, p)
    })

  override def serialize(b: TopKPairHeap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * b.n)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.key(i)); bb.putLong(b.pay(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairHeap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val m = bb.getInt
    val h = new TopKPairHeap(k)
    var i = 0
    while (i < m) {
      val sk = bb.getLong
      val p = bb.getLong
      h.insert(sk, p)
      i += 1
    }
    h
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairs =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "top_k_pairs"
}

object TopK {
  /** The k largest (sortKey, payload) pairs, descending. */
  def topKPairs(sortKey: Column, payload: Column, k: Int): Column =
    GraftShims.column(TopKPairs(
      GraftShims.expression(sortKey), GraftShims.expression(payload), k)
      .toAggregateExpression())
}
