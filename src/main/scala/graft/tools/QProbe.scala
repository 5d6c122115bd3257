package graft.tools
import org.apache.spark.sql.SparkSession
object QProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("QPROBE_CPUS", "8").toInt
    // the full GraftSession contract (extensions + tuning confs) so probe
    // timings measure the same session the bench runs under
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val names = args(0).split(",")
    names.foreach { n =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, dir).count()
        println(f"[probe] $n run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    }
    spark.stop()
  }
}
