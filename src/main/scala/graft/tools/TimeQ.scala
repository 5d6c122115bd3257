package graft.tools
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (name <- args) {
      // warm session on an unrelated query first iteration only
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"[timeq] $name ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
