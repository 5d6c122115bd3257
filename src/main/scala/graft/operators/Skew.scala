package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY §2.13 scale posture): AQE's
  * skew-join handles sort-merge skew at runtime; this explicit salted join
  * is the deterministic fallback for pathological single-key hotspots
  * (e.g. one batch level holding 30% of 100 TB).
  *
  * Left rows get a content-derived salt in [0, nSalts); right rows are
  * replicated once per salt. The join key becomes (key, salt), splitting a
  * hot key's rows across nSalts reducers. Right-side replication is the
  * cost, so use for small-to-medium right sides or high nSalts only on the
  * hot keys (pass a filtered `right`).
  */
object Skew {

  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      nSalts: Int = 8): DataFrame = {
    require(nSalts > 0)
    val salted = left.withColumn("__salt_l",
      pmod(xxhash64(struct(left.columns.map(col).toSeq: _*)), lit(nSalts)).cast("int"))
    val replicated = right.withColumn("__salt_r",
      explode(array((0 until nSalts).map(lit): _*)))
    salted.join(replicated, leftKey === rightKey && col("__salt_l") === col("__salt_r"))
      .drop("__salt_l", "__salt_r")
  }
}
