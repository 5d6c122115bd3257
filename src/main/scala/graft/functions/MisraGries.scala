package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra-Gries frequent-items summary over longs: at most `k` (value →
  * counter) pairs. The MERGEABLE variant (Agarwal et al., "Mergeable
  * Summaries", PODS 2012): inserting into a full summary adds the entry
  * then subtracts the (k+1)-th largest counter from every entry and evicts
  * the non-positive ones — one trim procedure serves both the per-row
  * update and the partial-summary merge, and the total undercount of any
  * value is bounded by N/(k+1).
  *
  * Guarantee the engine relies on (see `Sketches.q51`): every value with
  * true frequency > N/(k+1) is PRESENT in the final summary — the summary
  * is a guaranteed superset of the heavy hitters, so an exact second pass
  * over just the candidates turns the approximate sketch into an exact,
  * oracle-checkable answer.
  */
final class MisraGriesSummary(val k: Int) {
  private[functions] val m = new scala.collection.mutable.LongMap[Long](k * 2)

  private def trim(): Unit = {
    if (m.size == k + 1) {
      // per-row update path (ADVICE r5): size is exactly k+1, so the
      // (k+1)-th largest counter IS the minimum — one O(k) scan, no sort,
      // no counts-array allocation. A mostly-unique stream hits this on
      // every insertion once the summary fills, so the classic
      // O(1)-amortized decrement behavior is preserved up to the map walk.
      var cStar = Long.MaxValue
      m.foreachEntry { (_, c) => if (c < cStar) cStar = c }
      subtractEvict(cStar)
    } else if (m.size > k) {
      // merge path only: arbitrary overshoot, sort for the (k+1)-th largest
      val counts = m.values.toArray
      java.util.Arrays.sort(counts)
      subtractEvict(counts(counts.length - (k + 1)))
    }
  }

  private def subtractEvict(cStar: Long): Unit = {
    val dead = new scala.collection.mutable.ArrayBuffer[Long]()
    m.foreachEntry { (v, c) =>
      if (c - cStar <= 0L) dead += v else m(v) = c - cStar
    }
    dead.foreach(m.remove)
  }

  def add(v: Long, w: Long = 1L): Unit = {
    // counters are always >= 1, so 0 is a safe absent sentinel (no boxing)
    val cur = m.getOrElse(v, 0L)
    if (cur != 0L) m(v) = cur + w
    else { m(v) = w; trim() }
  }

  def mergeFrom(o: MisraGriesSummary): Unit = {
    o.m.foreachEntry { (v, c) =>
      val cur = m.getOrElse(v, 0L)
      if (cur != 0L) m(v) = cur + c else m(v) = c
    }
    trim()
  }

  /** Surviving candidate values, ascending (deterministic output order). */
  def candidates: Array[Long] = {
    val out = m.keys.toArray
    java.util.Arrays.sort(out)
    out
  }

  def size: Int = m.size
}

/** `misra_gries(longCol, k)` -> array<long>: the ≤ k candidate values of a
  * mergeable Misra-Gries summary, ascending. Map-side Partial folding, one
  * exchange of k-pair summaries — the heavy-hitter candidate generator
  * whose output is a guaranteed superset of every value with frequency
  * > N/(k+1), regardless of key cardinality. */
case class MisraGriesSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesSummary]
  with UnaryLike[Expression] {

  require(k > 0 && k <= (1 << 20), s"misra_gries k=$k out of range")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"misra_gries requires a BIGINT child, got ${child.dataType.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MisraGriesSummary = new MisraGriesSummary(k)

  override def update(b: MisraGriesSummary, row: InternalRow): MisraGriesSummary = {
    val v = child.eval(row)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: MisraGriesSummary, o: MisraGriesSummary): MisraGriesSummary = {
    b.mergeFrom(o)
    b
  }

  override def eval(b: MisraGriesSummary): Any = new GenericArrayData(b.candidates)

  override def serialize(b: MisraGriesSummary): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * b.size)
    bb.putInt(b.size)
    b.m.foreachEntry { (v, c) => bb.putLong(v); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesSummary = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new MisraGriesSummary(k)
    var i = 0
    while (i < n) { s.add(bb.getLong, bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MisraGriesSketch =
    copy(child = c)
  override def prettyName: String = "misra_gries"
}

object MisraGries {
  /** Candidate heavy-hitter values (ascending) of a long column. */
  def misraGries(c: Column, k: Int): Column =
    GraftShims.column(MisraGriesSketch(GraftShims.expression(c), k).toAggregateExpression())
}
