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

  test("AQE splits a planted skewed sort-merge join at runtime") {
    // the OTHER half of the skew story next to Skew.saltedJoin: when a
    // shuffle partition blows past the skew thresholds, AQE must re-plan
    // the SMJ as a skew join (hot partition split across tasks) with the
    // SAME result — the runtime remedy a 100 TB job leans on when the
    // skew wasn't known at authoring time
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val sp = spark
    import sp.implicits._
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // hot key 0: 40k left rows x 40 right rows; cold keys tiny
      val left = sp.range(0, 40000).select(lit(0L).as("k"), col("id").as("lv"))
        .unionByName(sp.range(1, 200).select(col("id").as("k"), col("id").as("lv")))
      val right = sp.range(0, 40).select(lit(0L).as("k"), col("id").as("rv"))
        .unionByName(sp.range(1, 200).select(col("id").as("k"), (col("id") * 2).as("rv")))
      val joined = left.join(right, Seq("k"))
      // execute THIS frame: .count() builds its own QueryExecution and the
      // inspected plan would stay isFinalPlan=false (measured)
      val n = joined.collect().length
      assert(n === 40000 * 40 + 199, s"join result wrong: $n")
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // QueryStageExec nodes are LEAVES (their subtree prints in toString
      // but is invisible to collect) — expand them explicitly
      def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] =
        p.collect { case n => n }.flatMap {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            q +: allNodes(q.plan)
          case n => Seq(n)
        }
      val smjs = allNodes(plan).collect { case j: SortMergeJoinExec => j }
      assert(smjs.nonEmpty,
        s"the planted join must plan as a sort-merge join; plan:\n${plan.toString.take(2500)}")
      assert(smjs.exists(_.isSkewJoin),
        s"AQE must mark the hot-key SMJ as a skew join; got ${smjs.map(_.isSkewJoin)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
