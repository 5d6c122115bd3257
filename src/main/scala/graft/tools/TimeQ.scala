package graft.tools
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    // warm the session (JVM + codegen + parquet footer cache) on an
    // unrelated scan so the first timed query isn't charged for startup
    // (ADVICE r6: the old comment promised this without doing it)
    spark.read.parquet(s"$dir/nation.parquet").count()
    for (name <- args) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"[timeq] $name ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
