package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev harness for the q80/st40 SCD2 lane's 100 TB posture: per-trigger
  * merge WORK must track the BATCH (plus the touched users' open tips),
  * not the standing dimension — closed history is never recomputed. The
  * honest O(dim) residual is the standing-table SCAN that locates the
  * touched tips (the s38 "discovery" analogue); a deployment bounds it by
  * user-bucketing the dimension and reading only touched buckets, which is
  * why st40's doc routes the rewrite through the staged-swap machinery.
  *
  * `runMain graft.tools.ScdRehearsal <nM events> <users> <batches>`:
  * synthesizes nM million time-ordered tier-change events over <users>
  * users, replays them as <batches> sequential merges into a parquet
  * dimension (st40's exact merge: per-user window over tips ∪ batch,
  * close-at-first-change, append the new chain, staged swap), printing
  * per-trigger walls as the dimension grows, then pins maintained ==
  * one-shot with anti-joins both ways.
  */
object ScdRehearsal {
  def main(args: Array[String]): Unit = {
    val nM = if (args.nonEmpty) args(0).toDouble else 1.0
    val nUsers = if (args.length > 1) args(1).toLong else 200000L
    val k = if (args.length > 2) args(2).toInt else 8
    val spark = graft.GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")
    import java.nio.file.{Files, Paths}
    val work = Files.createTempDirectory("graft_scd_rehearsal_")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scd-scale] $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    try {
      val n = (nM * 1e6).toLong
      // event_id doubles as the strictly-increasing time surrogate, so
      // the per-user order is (ord) with no ties
      val ev = spark.range(0, n, 1, 32).select(
        col("id").as("ord"),
        pmod(xxhash64(col("id"), lit(1)), lit(nUsers)).as("user_id"),
        pmod(xxhash64(col("id"), lit(2)), lit(5)).as("tier"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      ev.count()
      val span = n / k + 1
      val dimDir = work.resolve("dim").toString
      def swapIn(live: String, staged: String): Unit = {
        val lp = Paths.get(live); val sp = Paths.get(staged)
        val retired = Paths.get(staged + "_retired")
        if (Files.isDirectory(lp)) Files.move(lp, retired)
        Files.move(sp, lp)
        graft.functions.CrossEngine.deleteRecursive(retired)
      }
      (0 until k).foreach { i =>
        val b = ev.filter(col("ord") >= i * span && col("ord") < (i + 1) * span)
        val hasDim = new java.io.File(dimDir).isDirectory
        val dimRows = if (hasDim) spark.read.parquet(dimDir).count() else 0L
        timed(f"trigger $i%2d (batch ~${span}%d rows, dim $dimRows%d rows)") {
          val cur =
            if (hasDim) spark.read.parquet(dimDir).localCheckpoint(true)
            else null
          val touched = b.select(col("user_id")).distinct()
          val tips =
            if (hasDim) cur.filter(col("valid_to").isNull)
              .join(touched, Seq("user_id"))
            else b.limit(0).select(col("user_id"), col("tier"),
              col("ord").as("valid_from"),
              lit(null).cast("long").as("valid_to"))
          val wu = Window.partitionBy(col("user_id")).orderBy(col("ord"))
          val aug = tips.select(col("user_id"),
              col("valid_from").as("ord"), col("tier"), lit(0).as("is_new"))
            .unionByName(b.select(col("user_id"), col("ord"), col("tier"),
              lit(1).as("is_new")))
          val changes = aug
            .withColumn("prev", lag(col("tier"), 1).over(wu))
            .filter(col("is_new") === 1 &&
              (col("prev").isNull || col("tier") =!= col("prev")))
            .localCheckpoint(true)
          val newV = changes
            .select(col("user_id"), col("tier"), col("ord").as("valid_from"))
            .withColumn("valid_to", lead(col("valid_from"), 1).over(
              Window.partitionBy(col("user_id")).orderBy(col("valid_from"))))
          val firstChange = changes.groupBy(col("user_id"))
            .agg(min(col("ord")).as("close_at"))
          val closedTips = tips.join(firstChange, Seq("user_id"))
            .select(col("user_id"), col("tier"), col("valid_from"),
              col("close_at").as("valid_to"))
          val out =
            if (hasDim)
              cur.join(firstChange.select(col("user_id"), lit(true).as("ch")),
                  Seq("user_id"), "left")
                .filter(col("valid_to").isNotNull || col("ch").isNull)
                .drop("ch")
                .unionByName(closedTips)
                .unionByName(newV)
            else newV
          out.write.mode("overwrite").parquet(dimDir + "_staging")
          swapIn(dimDir, dimDir + "_staging")
        }
      }
      // maintained == one-shot
      val maintained = spark.read.parquet(dimDir)
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ord"))
      val oneShot = ev
        .withColumn("prev", lag(col("tier"), 1).over(wOrd))
        .filter(col("prev").isNull || col("tier") =!= col("prev"))
        .select(col("user_id"), col("tier"), col("ord").as("valid_from"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("valid_from"))))
      def canon(df: DataFrame): DataFrame = df.select(col("user_id"),
        col("tier"), col("valid_from"),
        coalesce(col("valid_to"), lit(-1L)).as("vt"))
      val eq = timed("maintained == one-shot (anti-joins both ways)") {
        val (m, o) = (canon(maintained), canon(oneShot))
        val cols = m.columns.toSeq
        m.join(o, cols, "left_anti").isEmpty &&
          o.join(m, cols, "left_anti").isEmpty
      }
      val nVersions = maintained.count()
      println(s"[scd-scale] n=$n users=$nUsers batches=$k versions=$nVersions " +
        s"maintained_equals_oneshot=$eq")
      require(eq, "incremental SCD2 merge drifted from the one-shot build")
    } finally {
      graft.functions.CrossEngine.deleteRecursive(work)
      spark.stop()
    }
  }
}
