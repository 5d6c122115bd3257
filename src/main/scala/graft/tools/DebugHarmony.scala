package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.harmony._

/** Dev harness: run one small Harmony fit with timing printouts. */
object DebugHarmony {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cells = spark.read.parquet(s"$sfDir/embeddings.parquet").select(
      col("vec_id").as("cell_id"),
      col("embedding").as("features"),
      col("label").cast("string").as("batch"))
    // phase timing: default-budget run (h07 shape) with kmeans isolated
    cells.count() // warm the scan
    val tK = System.nanoTime()
    val resK = Harmony.fit(cells, Seq("batch"),
      HarmonyOptions(maxIterHarmony = 0))
    println(s"[prof] setup+kmeans only: ${(System.nanoTime() - tK) / 1e9}s")
    val tF = System.nanoTime()
    val resF = Harmony.fit(cells, Seq("batch"), HarmonyOptions())
    println(s"[prof] full default run: ${(System.nanoTime() - tF) / 1e9}s, rounds=${resF.rounds}")

    val t0 = System.nanoTime()
    val res = Harmony.fit(cells, Seq("batch"), HarmonyOptions(
      nclust = Some(20), maxIterHarmony = 2, maxIterCluster = 2,
      blockSize = 0.2, earlyStop = false))
    println(s"fit done in ${(System.nanoTime() - t0) / 1e9}s, rounds=${res.rounds}")
    println(s"objective_kmeans=${res.state.objectiveKmeans.mkString(", ")}")
    println(s"chi2=${res.state.chiSquared}")
    // op 55 observability: per-phase timers + executor-side row metric
    res.state.phaseSeconds.foreach { case (k, v) => println(f"[phase] $k%-22s $v%7.2f s") }
    res.state.rowsVisited.foreach(a => println(s"[phase] sweep rows visited: ${a.value}"))
    println(s"[phase] job group: ${res.state.jobGroup}")
    println(s"corrected rows=${res.corrected.count()}")
    res.corrected.show(3, false)
    spark.stop()
  }
}
