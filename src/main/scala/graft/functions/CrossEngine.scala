package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Helpers whose contract is shared with the DuckDB oracle or with the
  * gate harness — single source of truth for cross-engine-identical
  * primitives and scratch-dir hygiene.
  */
object CrossEngine {

  /** 60-bit md5-derived uniform hash, identical in Spark and DuckDB:
    * 15 hex chars of md5 -> BIGINT-safe integer. `salt = None` hashes the
    * value as-is (cast to string); `Some(i)` appends the `#i` suffix the
    * dedup LSH families use. DuckDB twin:
    * `CAST(concat('0x', substring(md5(<v>), 1, 15)) AS BIGINT)`. */
  def md5Hash60(c: Column, salt: Option[Int] = None): Column = {
    val keyed = salt match {
      case Some(i) => concat(c, lit(s"#$i"))
      case None    => c.cast("string")
    }
    conv(substring(md5(keyed), 1, 15), 16, 10).cast("long")
  }

  /** Lazy id-space guard for planted-duplicate harnesses: passes `id`
    * through untouched below `limit` and raises a descriptive error inside
    * the same scan otherwise — no extra job, no extra table scan, but a
    * corpus whose ids collide with the planted id range fails LOUDLY
    * instead of silently pairing real docs with planted ones. */
  def guardedId(id: Column, limit: Long, site: String): Column =
    when(id < limit, id)
      .otherwise(raise_error(concat(lit(
        s"$site: planted-id space needs source ids < $limit; got "), id.cast("string")))
        .cast("long"))

  /** Materialize a bounded DataFrame into a local-backed one with the same
    * schema, so later writes can't depend on scratch inputs that are about
    * to be deleted (memory sinks, temp write dirs). */
  def materializeLocal(s: SparkSession, df: DataFrame): DataFrame = {
    val rows = df.collect()
    s.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
  }

  /** Best-effort recursive delete of a scratch directory. The walk stream
    * is closed explicitly (it holds a directory handle) and BOTH checked
    * and unchecked IO failures are swallowed — Files.walk's iterator
    * throws UncheckedIOException if an entry vanishes mid-walk, and a
    * best-effort cleanup must never fail a query whose result is already
    * computed. */
  def deleteRecursive(dir: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    try {
      val stream = java.nio.file.Files.walk(dir)
      try stream.iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally stream.close()
    } catch {
      case _: java.io.IOException | _: java.io.UncheckedIOException =>
    }
  }
}
