package graft.tools

import org.apache.spark.sql.functions._

/** r11 debug scratch for the t31 logistic trainer: loss trace + residual
  * training errors per configuration, on the gate fixture. */
object LrScratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    import graft.operators.TextAnalysis._
    val docs = graft.sources.Tables.documents(spark, dir).select(col("doc_id"),
      when(col("doc_id") % 3 === 0, lit(1L)).otherwise(lit(0L)).as("label"),
      when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" clickspam buynow clickspam")))
        .otherwise(concat(col("text"), lit(" organiccontent"))).as("text"))
    val feats = lrFeatures(docs).localCheckpoint(true)
    for ((iters, rate) <- Seq((30, 0.3), (30, 1.0), (60, 1.0), (100, 2.0))) {
      val (w, losses) = lrTrain(feats, iters, rate)
      val errs = lrPredict(feats, w)
        .filter(col("pred") =!= col("label")).count()
      println(f"[lr-scratch] iters=$iters rate=$rate: loss ${losses.head}%.1f -> " +
        f"${losses.last}%.3f errs=$errs  trace=${losses.grouped(math.max(1, losses.size / 8)).map(_.head.round).mkString(",")}")
    }
    spark.stop()
  }
}
