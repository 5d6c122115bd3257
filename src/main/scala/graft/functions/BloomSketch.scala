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

/** `bloom_sketch(stringCol, mBits, kHashes)` -> array<long> (mBits/64
  * words, little-endian bit order within each word): the Bloom 1970
  * membership filter as a native Catalyst [[TypedImperativeAggregate]] —
  * the sixth member of the engine's mergeable-sketch family (KMV NDV,
  * Misra-Gries, count-min, histogram quantiles, top-k heap). The others
  * answer "how many / how often / how big"; Bloom answers "have I seen
  * THIS key", with NO false negatives by construction — the primitive
  * behind streaming exact-dedup admission, shuffle-join pre-filters and
  * the per-bucket membership sidecars an ANN-index delete would use to
  * bound its discovery scan (SCALE.md, GraphLifecycleRehearsal).
  *
  * Bit positions are the Kirsch-Mitzenmacher double hash
  * `pos_i = (h1 + i*h2) mod m` over two md5-derived 60-bit uniforms
  * ([[CrossEngine.md5Hash60]] with salts 101/102 — the engine's `#salt`
  * convention), so the filter CONTENT — not just its answers — is
  * bit-reproducible in DuckDB SQL and the whole structure runs under the
  * driver's hash gate (Spark's own `bloom_filter_agg` uses engine-private
  * hashing and an opaque binary for exactly this reason; i <= kHashes-1
  * and h1,h2 < 2^60 keep `h1 + i*h2` far from Long overflow).
  *
  * Scale contract: the buffer is mBits/64 longs, independent of row
  * count; partials fold map-side, the shuffle carries one fixed-size
  * buffer per group, and merge is elementwise OR — commutative,
  * associative, idempotent — so partition-wise merge equals the
  * single-pass filter bit-identically under any partitioning (spec'd).
  * NULL inputs are skipped.
  */
case class BloomSketch(
    child: Expression,
    mBits: Int,
    kHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  // 2^24 bits = a 2 MB buffer per group — plenty for any per-group use;
  // the bound keeps a typo'd size from allocating per-group gigabytes
  // inside the aggregation hash map
  require(mBits >= 64 && mBits <= (1 << 24) && mBits % 64 == 0,
    s"bloom_sketch mBits=$mBits out of range [64, 2^24] or not word-aligned")
  require(kHashes > 0 && kHashes <= 8,
    s"bloom_sketch kHashes=$kHashes out of range (0, 8]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_sketch requires a STRING child, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](mBits / 64)

  @transient private lazy val md5 = java.security.MessageDigest.getInstance("MD5")

  /** md5Hash60 in JVM form (the CountMinSketch contract): first 15 hex
    * chars of md5(key + "#" + salt), base-16 — a 60-bit non-negative
    * long identical to the Spark/DuckDB expressions. */
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
      val key = v.toString
      val h1 = h60(key, 101)
      val h2 = h60(key, 102)
      var i = 0
      while (i < kHashes) {
        val pos = ((h1 + i.toLong * h2) % mBits).toInt
        b(pos >> 6) |= (1L << (pos & 63))
        i += 1
      }
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) |= o(i); i += 1 }
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
    val b = new Array[Long](mBits / 64)
    var i = 0
    while (i < b.length) { b(i) = bb.getLong; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BloomSketch =
    copy(child = c)
  override def prettyName: String = "bloom_sketch_md5"
}

object Bloom {
  /** mBits-bit Bloom filter of a string column as mBits/64 longs,
    * Kirsch-Mitzenmacher double hashing over md5 60-bit uniforms
    * (cross-engine reproducible). */
  def bloomSketch(c: Column, mBits: Int, kHashes: Int): Column =
    GraftShims.column(
      BloomSketch(GraftShims.expression(c), mBits, kHashes).toAggregateExpression())
}
