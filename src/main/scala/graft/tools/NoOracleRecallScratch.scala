package graft.tools

import org.apache.spark.sql.functions._

/** Measurement scratch for the r11 no-oracle greening (VERDICT r10 next-6):
  * before pinning constant-true recall booleans on the randomized-hash
  * lanes, MEASURE what the fixed hash families actually deliver on the
  * gate corpora at sf0.01 and sf0.1 — near-planted recall for d02/d03 and
  * the exact-twin top-10 recall for s02/s03/s08/s10 — so every gated
  * boolean sits strictly inside measured behavior (a threshold chosen
  * above measurement would go red on the driver's first run).
  */
object NoOracleRecallScratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      println(s"===== $dir =====")
      // d02: minhash near recall on withPlantedDups (truncate90 twins)
      val docs = graft.operators.Dedup.withPlantedDups(spark, dir)
      val planted = docs.filter(col("doc_id") < 10000000L && col("doc_id") % 10 === 0)
        .select(col("doc_id").as("doc_a"), (col("doc_id") + 10000000L).as("doc_b"))
      val mh = graft.operators.Dedup.minhashPairs(docs)
      val mhj = planted.join(mh, Seq("doc_a", "doc_b"), "left")
        .agg(count(lit(1)).as("planted"), count(col("jaccard")).as("found"),
          min(col("jaccard")).as("min_j"), min(col("est_jaccard")).as("min_est"))
        .head()
      println(s"d02 minhash: planted=${mhj.getLong(0)} found=${mhj.getLong(1)} " +
        s"min_j=${mhj.get(2)} min_est=${mhj.get(3)}")
      val sh = graft.operators.Dedup.simhashPairs(docs)
      val shj = planted.join(sh, Seq("doc_a", "doc_b"), "left")
        .agg(count(lit(1)).as("planted"), count(col("hamming")).as("found"),
          max(col("hamming")).as("max_h"))
        .head()
      println(s"d03 simhash: planted=${shj.getLong(0)} found=${shj.getLong(1)} " +
        s"max_h=${shj.get(2)}")
      // s02/s03/s08/s10 twin recall via the public wrappers
      graft.operators.Similarity.twinRecallScratch(spark, dir).foreach(println)
    }
    spark.stop()
  }
}
