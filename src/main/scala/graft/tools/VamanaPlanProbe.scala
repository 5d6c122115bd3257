package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

/** Dev-only plan evidence for the s40 rewrite (r19): dumps the formatted
  * plan of ONE relational prune round in the r18 unrolled shape (copied
  * here verbatim as the reference — the shipped code no longer contains
  * it) next to the shipped grouped row-local prune plan. The committed
  * s40 entry output is a materialized leaf, so the interesting plans live
  * one level down.
  *
  * Usage: runMain graft.tools.VamanaPlanProbe <outPrefix>
  */
object VamanaPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    import graft.operators.Similarity
    import graft.functions.VectorExpressions.l2DistSq
    Similarity.withConstraintPropagationOff(spark) {
      val emb = Similarity.nndPlantedVecs(spark, dir)
        .select(col("vec_id").as("id"), col("embedding"))
      val graph = Similarity.GraphIndexCache.graph(spark, dir).localCheckpoint(true)
      val twoHop = graph.alias("a").join(graph.alias("b"), col("a.v") === col("b.u"))
        .filter(col("a.u") =!= col("b.v"))
        .select(col("a.u").as("p"), col("b.v").as("v"))
      val vc = graph.select(col("u").as("p"), col("v"))
        .unionByName(twoHop).distinct()
      // --- r18 shape: scored candidate table + ONE selection round + ONE
      // dominance-filter round (of the 8 the loop unrolled)
      val rem = vc
        .join(emb.select(col("id").as("p"), col("embedding").as("ep")), Seq("p"))
        .join(emb.select(col("id").as("v"), col("embedding").as("ev")), Seq("v"))
        .select(col("p"), col("v"), l2DistSq(col("ep"), col("ev")).as("d"))
        .localCheckpoint(true)
      val sel = Similarity.topKByScore(rem, "p", "v", col("d"), 1, ascending = true)
        .select(col("p"), col("v"), col("score").as("d"))
        .localCheckpoint(true)
      val remNext = rem
        .join(sel.select(col("p"), col("v").as("sv")), Seq("p"))
        .join(emb.select(col("id").as("sv"), col("embedding").as("es")), Seq("sv"))
        .join(emb.select(col("id").as("v"), col("embedding").as("ev")), Seq("v"))
        .filter(col("v") =!= col("sv") &&
          lit(1.1) * l2DistSq(col("es"), col("ev")) > col("d"))
        .select(col("p"), col("v"), col("d"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(args(0) + "_before.txt"),
        "== r18 shape: ONE of 8 unrolled dominance rounds (plus a topK pick " +
          "round, both eagerly checkpointed per k) ==\n" +
          remNext.queryExecution.explainString(FormattedMode))
      // --- r19 shape: the shipped grouped row-local prune
      val plans = scala.collection.mutable.ArrayBuffer[String]()
      val pruned = Similarity.vamanaPrune(graph, emb, 8, 1.1, plans)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(args(0) + "_after.txt"),
        "== r19 shape: one grouped shuffle + row-local greedy prune " +
          "(vamanaPrune output is a checkpointed leaf; this is the plan the " +
          "checkpoint materialized) ==\n" + plans.head)
      println(s"[vamana] pruned edges: ${pruned.count()}")
    }
    spark.stop()
  }
}
