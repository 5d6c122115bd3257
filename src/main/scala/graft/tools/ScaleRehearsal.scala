package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.harmony._

/** Dev harness for the 100 TB posture: synthesize an N-million-cell table
  * (Gaussian mixture + planted batch offsets, generated distributed — no
  * driver materialization) and profile the DISTRIBUTED Harmony path plus a
  * representative aggregation, reporting wall-clock per phase.
  *
  * Usage: runMain graft.tools.ScaleRehearsal [nMillions] [d] [mode]
  */
object ScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val nM = if (args.nonEmpty) args(0).toDouble else 2.0
    val d = if (args.length > 1) args(1).toInt else 32
    val mode = if (args.length > 2) args(2) else "sweep"
    val n = (nM * 1e6).toLong

    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // RDD-shuffle path (Sequential block alignment) serializes CellState
      // rows; Kryo more than halves the bytes vs Java serialization
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.kryo.registrationRequired", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // distributed synthesis: 4 latent clusters, 3 batches with offsets
    val cells = timed(s"synthesize ${nM}M x $d") {
      val base = spark.range(0, n, 1, 32)
        .withColumn("cl", pmod(col("id"), lit(4)))
        .withColumn("batch", concat(lit("b"), pmod(xxhash64(col("id")), lit(3))))
      val feats = (0 until d).map { j =>
        (randn(seed = 100 + j) * 0.5
          + col("cl") * lit(math.sin(j * 1.7) * 2.0)
          + when(col("batch") === "b1", lit(math.cos(j) * 1.2)).otherwise(lit(0.0)))
          .cast("float")
      }
      val df = base.select(col("id").as("cell_id"),
        array(feats: _*).as("features"), col("batch"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    }

    val budget = if (args.length > 3) args(3) else "short"
    // optional 5th arg: resaltEvery (Sequential-mode per-k-rounds atom
    // redraw — measures the cost of the extra hash shuffle per group)
    val resalt = if (args.length > 4) args(4).toInt else 0
    val bm = if (mode == "seq") BlockMode.Sequential else BlockMode.Sweep
    val opts = budget match {
      case "full" =>
        // reference-default budget, forced distributed: the endurance test
        // (up to 10 rounds x 4 sweeps x 20 blocks of jobs + lineage)
        HarmonyOptions(nclust = Some(20), localThreshold = 0L,
          blockMode = bm, resaltEvery = resalt)
      case "mid" =>
        // fixed 3 rounds x 2 sweeps: deterministic round count for
        // controlled A/B comparisons (e.g. resaltEvery overhead)
        HarmonyOptions(nclust = Some(20), maxIterHarmony = 3,
          maxIterCluster = 2, earlyStop = false, localThreshold = 0L,
          blockMode = bm, resaltEvery = resalt)
      case _ =>
        HarmonyOptions(
          nclust = Some(20), maxIterHarmony = 1, maxIterCluster = 2,
          earlyStop = false, localThreshold = 0L,
          blockMode = bm, resaltEvery = resalt)
    }

    val res = timed(s"harmony ($mode, $budget)") {
      Harmony.fit(cells, Seq("batch"), opts)
    }
    println(s"[scale] rounds run: ${res.rounds}, sweeps/round: ${res.state.kmeansRounds.mkString(",")}")
    println(s"[scale] objective: ${res.state.objectiveKmeans.mkString(" -> ")}")
    println(s"[scale] chi2: ${res.state.chiSquared}")

    timed("corrected agg (mean of dim0)") {
      res.corrected.agg(avg(element_at(col("features"), 1))).head()
    }
    spark.stop()
  }
}
