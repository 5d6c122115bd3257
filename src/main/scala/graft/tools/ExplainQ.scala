package graft.tools

/** Print the formatted physical plan of named SparkEntry queries at sf0.1 —
  * the per-operator plan-audit loop (PushedFilters / WholeStageCodegen /
  * exchange count) without writing a scratch main each time.
  *
  * Usage: runMain graft.tools.ExplainQ <query-name> [more...]
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (name <- args) {
      println(s"\n===== $name =====")
      println(graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
