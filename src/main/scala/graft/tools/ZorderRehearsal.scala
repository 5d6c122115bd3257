package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev harness for w22's 100 TB posture: the z-order layout's pruning
  * numbers (1 vs 4 buckets on the 2-D box, 4 vs 16 on the non-range
  * column) are value-mirrored at gate scale — this measures what they BUY
  * in real IO at 50M rows: wall time of the manifest-planned pruned read
  * vs the full-layout read for the same predicate, on both layouts.
  *
  * `runMain graft.tools.ZorderRehearsal <nM rows>`
  */
object ZorderRehearsal {
  def main(args: Array[String]): Unit = {
    val nM = if (args.nonEmpty) args(0).toDouble else 50.0
    val spark = graft.GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")
    val work = java.nio.file.Files.createTempDirectory("graft_zorder_")
    def timed[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[zorder-scale] $label%-52s $sec%8.2f s")
      (r, sec)
    }
    try {
      val n = (nM * 1e6).toLong
      def bit(c: org.apache.spark.sql.Column, i: Int) =
        shiftright(c, i).bitwiseAND(lit(1L))
      val x = pmod(xxhash64(col("id"), lit(1)), lit(16L))
      val y = pmod(xxhash64(col("id"), lit(2)), lit(16L))
      // a ~130-byte payload makes decode the dominant cost, as at real
      // table widths — a 4-long row is too cheap for layout to show
      val coded = spark.range(0, n, 1, 32).select(
        x.as("x"), y.as("y"), col("id").as("k"),
        md5(concat(col("id").cast("string"), lit("#a"))).as("pay1"),
        md5(concat(col("id").cast("string"), lit("#b"))).as("pay2"),
        md5(concat(col("id").cast("string"), lit("#c"))).as("pay3"),
        md5(concat(col("id").cast("string"), lit("#d"))).as("pay4"),
        (0 until 4).map(i =>
          bit(x, i) * lit(1L << (2 * i)) + bit(y, i) * lit(1L << (2 * i + 1)))
          .reduce(_ + _).as("m"))
      timed(s"write z-order layout ($n rows, 16 buckets)") {
        coded.withColumn("pf", (col("m") / 16).cast("long"))
          .write.mode("overwrite").partitionBy("pf")
          .parquet(s"$work/z")
      }
      timed(s"write linear layout ($n rows, 16 buckets)") {
        coded.withColumn("pf", col("x"))
          .write.mode("overwrite").partitionBy("pf")
          .parquet(s"$work/linear")
      }
      def manifest(layout: String): Seq[(String, Long, Long, Long, Long)] =
        spark.read.parquet(s"$work/$layout")
          .groupBy(col("pf").cast("long").as("pf"))
          .agg(min(col("x")), max(col("x")), min(col("y")), max(col("y")))
          .collect().toSeq
          .map(r => (s"$work/$layout/pf=${r.getLong(0)}",
            r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      val mz = manifest("z")
      val ml = manifest("linear")
      def drive(tag: String, mf: Seq[(String, Long, Long, Long, Long)],
                xLo: Long, xHi: Long, yLo: Long, yHi: Long): Unit = {
        val sel = mf.filter { case (_, mnx, mxx, mny, mxy) =>
          mnx <= xHi && mxx >= xLo && mny <= yHi && mxy >= yLo
        }
        val p = col("x").between(xLo, xHi) && col("y").between(yLo, yHi)
        // WARM measurement: first run pays page-cache and codegen
        // first-touch, the reported second run isolates decode + skipping
        // (the steady-state cost a hot cluster pays)
        def agg(paths: Seq[String]) =
          spark.read.parquet(paths: _*).filter(p)
            .agg(count(lit(1)), sum(col("k")),
              sum(length(col("pay1")) + length(col("pay2"))
                + length(col("pay3")) + length(col("pay4")))).head()
        agg(sel.map(_._1))
        val (pruned, pw) = timed(s"$tag pruned read (${sel.size}/16 buckets, warm)") {
          agg(sel.map(_._1))
        }
        agg(mf.map(_._1))
        val (full, fw) = timed(s"$tag full read (16/16 buckets, warm)") {
          agg(mf.map(_._1))
        }
        require(pruned == full, s"$tag: pruned != full")
        println(f"[zorder-scale] $tag speedup ${fw / pw}%.2fx " +
          f"(rows ${pruned.getLong(0)})")
      }
      drive("BOX x,y in [4,7] on Z    ", mz, 4, 7, 4, 7)
      drive("BOX x,y in [4,7] on LINEAR", ml, 4, 7, 4, 7)
      drive("Y-ONLY y in [4,7] on Z    ", mz, 0, 15, 4, 7)
      drive("Y-ONLY y in [4,7] on LINEAR", ml, 0, 15, 4, 7)
    } finally {
      graft.functions.CrossEngine.deleteRecursive(work)
      spark.stop()
    }
  }
}
