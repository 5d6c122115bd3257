package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Shuffle-elimination machinery: bucketed co-located joins and salted
  * skew joins (the 100 TB-posture techniques README describes). */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join with no Exchange on either side") {
    val sp = spark
    sp.sql("DROP TABLE IF EXISTS b_orders")
    sp.sql("DROP TABLE IF EXISTS b_lineitem")
    sp.read.parquet(s"$sfDir/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    sp.read.parquet(s"$sfDir/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val prevThreshold = sp.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      sp.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = sp.table("b_lineitem")
        .join(sp.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val physical = joined.queryExecution.executedPlan.toString
      // bucket-co-located join: the only Exchange allowed is for the final
      // single-key aggregation, never below the join
      val joinIdx = physical.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected a sort-merge join:\n$physical")
      assert(!physical.substring(joinIdx).contains("Exchange"),
        s"join inputs should be shuffle-free (bucketed):\n$physical")
      // result matches the plain (shuffling) join
      val expected = sp.read.parquet(s"$sfDir/lineitem.parquet")
        .join(sp.read.parquet(s"$sfDir/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === expected)
    } finally {
      sp.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      sp.sql("DROP TABLE IF EXISTS b_orders")
      sp.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("salted join returns exactly the plain-join result") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
    val salted = Skew.saltedJoin(li, o, col("l_orderkey"), col("o_orderkey"), nSalts = 4).count()
    assert(salted === plain)
  }

  test("partitioned parquet write round-trips with partition pruning") {
    val out = java.nio.file.Files.createTempDirectory("graft_part_").toString
    spark.read.parquet(s"$sfDir/orders.parquet")
      .write.partitionBy("o_orderstatus").mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() === 1500)
    val pruned = back.filter(col("o_orderstatus") === "O")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() > 0)
    // partition filter must be applied at the scan, not post-hoc
    assert(scan.contains("PartitionFilters") || !scan.contains("o_orderstatus = O"))
  }
}
