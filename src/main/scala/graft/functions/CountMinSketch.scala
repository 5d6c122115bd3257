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

/** `count_min_sketch(stringCol, depth, width)` -> array<long> (row-major
  * depth x width counters): the Cormode/Muthukrishnan 2005 frequency
  * sketch as a native Catalyst [[TypedImperativeAggregate]] — the fourth
  * member of the engine's mergeable-sketch family (KMV NDV
  * [[BottomKDistinct]], Misra-Gries [[MisraGriesSketch]], quantiles
  * [[HistogramSketch]]). Misra-Gries answers "which keys are heavy";
  * count-min answers "how often is THIS key", for any key, from the same
  * fixed-size state.
  *
  * Row hashes are md5-derived with the engine's `#j` salt convention
  * ([[CrossEngine.md5Hash60]]): cell for key k in row j is
  * `md5Hash60(k, salt = j) mod width`. md5 row-hashing makes the sketch
  * content — not just its estimates — bit-reproducible in DuckDB SQL, so
  * the whole structure runs under the driver's hash gate (Spark's own
  * `count_min_sketch` function uses engine-private seeds and returns an
  * opaque binary for exactly this reason). The estimate for k is
  * min over j of cell(j, k) — never below the true count (every update
  * that touches k's cells adds its full weight), with the usual
  * eps = e/width overestimate bound from colliding keys.
  *
  * Scale contract: the buffer is depth x width longs, independent of row
  * count; partials fold map-side and the shuffle carries one fixed-size
  * buffer per group; merge is an elementwise long add — commutative,
  * associative, lossless — so partition-wise merge equals the single-pass
  * sketch bit-identically under any partitioning (spec'd). NULL inputs
  * are skipped.
  */
case class CountMinSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  // 16 rows x 2^16 columns = an 8 MB buffer per group — far past any useful
  // accuracy (eps ~ 4e-5); the bound keeps a typo'd width from allocating
  // per-group gigabytes inside the aggregation hash map
  require(depth > 0 && depth <= 16,
    s"count_min_sketch depth=$depth out of range (0, 16]")
  require(width > 0 && width <= (1 << 16),
    s"count_min_sketch width=$width out of range (0, ${1 << 16}]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"count_min_sketch requires a STRING child, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  /** The md5Hash60 contract in JVM form: first 15 hex chars of
    * md5(key + "#" + j) parsed base-16 — a 60-bit non-negative long,
    * identical to Spark's `conv(substring(md5(concat(k, '#j')), 1, 15),
    * 16, 10)` and DuckDB's `CAST(concat('0x', substring(md5(k || '#j'),
    * 1, 15)) AS BIGINT)`. */
  // one digest instance per aggregate instance; MessageDigest.digest()
  // resets internal state after each call, and TypedImperativeAggregate
  // buffers are updated single-threaded. Transient: the expression ships
  // to executors serialized, the digest must not.
  @transient private lazy val md5 = java.security.MessageDigest.getInstance("MD5")

  private def cell(key: String, j: Int): Int = {
    val digest = md5.digest((key + "#" + j).getBytes("UTF-8"))
    // first 15 hex chars = bytes 0..6 plus the high nibble of byte 7
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (digest(i) & 0xffL); i += 1 }
    h = (h << 4) | ((digest(7) & 0xf0L) >> 4)
    (h % width).toInt
  }

  override def update(b: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val key = v.toString
      var j = 0
      while (j < depth) { b(j * width + cell(key, j)) += 1; j += 1 }
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b)

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * b.length)
    var i = 0
    while (i < b.length) { bb.putLong(b(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new Array[Long](depth * width)
    var i = 0
    while (i < b.length) { b(i) = bb.getLong; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CountMinSketch =
    copy(child = c)
  override def prettyName: String = "count_min_sketch_md5"
}

object CountMin {
  /** Row-major depth x width count-min sketch of a string column, md5-salt
    * row hashes (cross-engine reproducible). */
  def countMinSketch(c: Column, depth: Int, width: Int): Column =
    GraftShims.column(
      CountMinSketch(GraftShims.expression(c), depth, width).toAggregateExpression())
}
