package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only plan/time probe for q63's iterated PageRank core: runs the
  * shared [[graft.operators.Relational.pageRank]] on q63's own edge
  * derivation, captures each iteration's PRE-checkpoint formatted plan
  * (the committed q63 plan dump is a checkpointed leaf and hides the
  * iteration shape), and times the full 5-iteration run.
  *
  * Usage: runMain graft.tools.PageRankPlanProbe [outPrefix]
  */
object PageRankPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val e0 = graft.sources.Tables.lineitem(spark, dir)
      .join(graft.sources.Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("u"), (col("l_suppkey") * 2 + 1).as("v"))
      .distinct()
    // warm: parquet footers + codegen
    e0.count()
    (1 to 3).foreach { i =>
      val plans = scala.collection.mutable.ArrayBuffer[String]()
      val marks = scala.collection.mutable.ArrayBuffer[Double]()
      val t0 = System.nanoTime()
      val pr = graft.operators.Relational.pageRank(e0, 5,
        if (i == 1) plans else null, marks)
      val n = pr.orderBy(col("rank").desc, col("node")).limit(25).count()
      println(f"[prprobe] run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n rows) " +
        "marks " + marks.map(m => f"$m%.2f").mkString(" "))
      if (i == 1 && args.nonEmpty) {
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(args(0) + "_iter2.txt"), plans(1))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(args(0) + "_iter5.txt"), plans(4))
      }
    }
    spark.stop()
  }
}
