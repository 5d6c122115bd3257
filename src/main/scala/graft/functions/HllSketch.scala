package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `hll_sketch(stringCol, p)` -> array<long> of m = 2^p registers: the
  * HyperLogLog distinct-count sketch (Flajolet, Fusy, Gandouet & Meunier
  * 2007 — the industry-standard NDV estimator every warehouse ships as
  * `approx_count_distinct`) as a native Catalyst
  * [[TypedImperativeAggregate]] — the seventh member of the engine's
  * mergeable-sketch family (KMV NDV, Misra-Gries, count-min, histogram
  * quantiles, top-k heap, Bloom). KMV (q48) already answers NDV from a
  * k-row bottom sketch; HLL answers it from a FIXED 2^p-register state
  * whose size never depends on k vs NDV, whose merge is elementwise max
  * (commutative, associative, IDEMPOTENT — re-merging a partial is
  * harmless, the property re-tried shuffle stages need), and whose
  * standard error 1.04/sqrt(m) is tunable by one parameter.
  *
  * Register mechanics over the engine's md5 60-bit uniform
  * ([[CrossEngine.md5Hash60]], salt 103 — Spark's own
  * `approx_count_distinct` HLL++ state is engine-private xxhash, opaque
  * to the gate, which is exactly why this one hashes reproducibly): the
  * top p hash bits pick the register, and the register keeps the MAX of
  * rank(w) = (60-p) - bitlength(w) + 1 over the remaining (60-p)-bit
  * suffix w — pure integer arithmetic both engines reproduce (DuckDB
  * mirrors bitlength as length(bin(w)); no floating log anywhere near
  * the registers). The ESTIMATE is derived from the returned register
  * array relationally (one aggregate() fold in register order, mirrored
  * by list_sum over the same order), so the gate hashes both the state
  * AND the estimate.
  *
  * Scale contract: the buffer is 2^p longs (p <= 14 -> at most 128 KB
  * per group), independent of row count; partials fold map-side, the
  * shuffle carries one fixed-size buffer per group. NULL inputs are
  * skipped.
  */
case class HllSketch(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(p >= 4 && p <= 14,
    s"hll_sketch p=$p out of range [4, 14] (m = 2^p registers)")

  private def m: Int = 1 << p

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_sketch requires a STRING child, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](m)

  @transient private lazy val md5 = java.security.MessageDigest.getInstance("MD5")

  /** md5Hash60 in JVM form (the BloomSketch/CountMinSketch contract). */
  private def h60(key: String, salt: Int): Long = {
    val digest = md5.digest((key + "#" + salt).getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (digest(i) & 0xffL); i += 1 }
    (h << 4) | ((digest(7) & 0xf0L) >> 4)
  }

  override def update(b: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val h = h60(v.toString, 103)
      val idx = (h >>> (60 - p)).toInt
      val w = h & ((1L << (60 - p)) - 1)
      // rank = leading zeros of the (60-p)-bit suffix + 1; w == 0 means
      // the whole suffix is zeros -> the maximal rank (60-p) + 1
      val rank =
        if (w == 0L) (60 - p) + 1
        else (60 - p) - (64 - java.lang.Long.numberOfLeadingZeros(w)) + 1
      if (rank.toLong > b(idx)) b(idx) = rank.toLong
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { if (o(i) > b(i)) b(i) = o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b)

  override def serialize(b: Array[Long]): Array[Byte] = {
    // registers are <= 57: one byte each
    val out = new Array[Byte](b.length)
    var i = 0
    while (i < b.length) { out(i) = b(i).toByte; i += 1 }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val b = new Array[Long](m)
    var i = 0
    while (i < b.length) { b(i) = bytes(i).toLong; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): HllSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HllSketch =
    copy(child = c)
  override def prettyName: String = "hll_sketch_md5"
}

object Hll {
  /** 2^p-register HyperLogLog state of a string column, md5-hashed
    * (cross-engine reproducible); estimate derived relationally. */
  def hllSketch(c: Column, p: Int): Column =
    GraftShims.column(
      HllSketch(GraftShims.expression(c), p).toAggregateExpression())
}
