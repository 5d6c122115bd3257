package graft.tools

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev-only job-level profiler: run a named SparkEntry query (twice — the
  * second run is steady-state), recording every Spark job's wall time and
  * call site, then print the second run's jobs sorted by duration. Shows
  * where a multi-job composite entry actually spends its wall clock —
  * the per-operator measurement loop of the optimization guide (§1) for
  * entries whose cost is spread over dozens of small jobs rather than one
  * plan.
  *
  * Usage: runMain graft.tools.JobProfile <query> [sfDir] [cpus]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2).toInt else 32
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = mutable.Map.empty[Int, (String, Long)] // id -> (site, t0)
    val done = mutable.ArrayBuffer.empty[(String, Double)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
          .takeWhile(_ != '\n')
        val nStages = js.stageInfos.size
        jobs(js.jobId) = (s"[$nStages st] $site", System.nanoTime())
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.remove(je.jobId).foreach { case (site, t0) =>
          done += ((site, (System.nanoTime() - t0) / 1e9))
        }
    })
    val fn = graft.SparkEntry.queries(name)
    val t0 = System.nanoTime()
    fn(spark, dir).count()
    println(f"[jobprofile] $name cold ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    done.clear()
    val t1 = System.nanoTime()
    fn(spark, dir).count()
    val wall = (System.nanoTime() - t1) / 1e9
    // give the async listener bus a moment to drain before reading
    Thread.sleep(500)
    println(f"[jobprofile] $name warm $wall%6.2f s, ${done.size} jobs, " +
      f"sum ${done.map(_._2).sum}%6.2f s")
    done.sortBy(-_._2).take(40).foreach { case (site, secs) =>
      println(f"[jobprofile]   $secs%7.3f s  $site")
    }
    // aggregate by call site
    println("[jobprofile] by site:")
    done.groupBy(_._1).map { case (s, xs) => (s, xs.map(_._2).sum, xs.size) }
      .toSeq.sortBy(-_._2).take(25).foreach { case (s, t, n) =>
        println(f"[jobprofile]   $t%7.3f s  n=$n%-4d $s")
      }
    spark.stop()
  }
}
