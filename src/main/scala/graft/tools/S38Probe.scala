package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Phase-level timing probe for s38's delete+repair pipeline — dev-only,
  * mirrors the entry's stages so optimization lands where the time is. */
object S38Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val S = graft.operators.Similarity
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[s38probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    S.withConstraintPropagationOff(spark) {
      timed("GraphIndexCache.ensure")(S.GraphIndexCache.ensure(spark, dir))
      val out = java.nio.file.Files.createTempDirectory("graft_s38p_").toString
      val e = timed("plantedVecs+count") {
        val e0 = S.nndPlantedVecs(spark, dir); e0.count(); e0
      }
      val n = e.count()
      timed("write knn bucketed")(S.edgeWriteBucketed(
        S.GraphIndexCache.knn(spark, dir).select(col("u"), col("v")), s"$out/knn"))
      timed("write links bucketed")(S.edgeWriteBucketed(
        S.nndHashInit(e, 6, n), s"$out/links"))
      def readEdges(t: String): DataFrame =
        spark.read.parquet(s"$out/$t").select(col("u"), col("v"))
      val preBeam = timed("pre-delete 1-query walk") {
        S.nswBeamSearch(spark, dir,
          readEdges("knn").unionByName(readEdges("links")).distinct()
            .localCheckpoint(true), kOut = 8,
          queriesIn = S.s30QueriesFor(spark).filter(col("query_id") === 1))
      }
      val doomed = timed("doomed collect") {
        preBeam.filter(col("query_id") === 1 && col("neighbor_id") =!= 0)
          .orderBy(col("rnk")).limit(3)
          .select(col("neighbor_id")).collect().map(_.getLong(0)).toSeq
      }
      val orphans = timed("orphans") {
        readEdges("knn")
          .filter(col("v").isin(doomed: _*) && !col("u").isin(doomed: _*))
          .select(col("u")).distinct().localCheckpoint(true)
      }
      timed("bucket file lists x2") {
        S.edgeBucketFiles(s"$out/knn"); S.edgeBucketFiles(s"$out/links")
      }
      timed("delete knn")(S.graphDeleteNodes(spark, s"$out/knn", doomed))
      timed("delete links")(S.graphDeleteNodes(spark, s"$out/links", doomed))
      timed("delete idempotence x2") {
        S.graphDeleteNodes(spark, s"$out/knn", doomed)
        S.graphDeleteNodes(spark, s"$out/links", doomed)
      }
      val delEdges = timed("read delEdges")(readEdges("knn").localCheckpoint(true))
      val fresh = delEdges.join(orphans, Seq("u"), "left_semi")
      val repaired = timed("repair descent round") {
        S.nnDescentIncremental(e.filter(!col("vec_id").isin(doomed: _*)),
          k = 6, rounds = 1, init = delEdges, revCap = 24, fresh0 = fresh)
          .localCheckpoint(true)
      }
      val newEdges = repaired.select(col("u"), col("v"))
      val changed = timed("changed buckets") {
        newEdges.except(delEdges).unionByName(delEdges.except(newEdges))
          .select(pmod(col("u"), lit(64L)).cast("int").as("bucket"))
          .distinct().collect().map(_.getInt(0)).toSeq.sorted
      }
      timed("rewrite changed")(S.edgeRewriteBuckets(spark, s"$out/knn", newEdges, changed))
      timed("post 20-query walk") {
        S.nswBeamSearch(spark, dir,
          readEdges("knn").unionByName(readEdges("links")).distinct()
            .localCheckpoint(true)).count()
      }
      timed("witnesses") {
        repaired.count()
        repaired.join(orphans, Seq("u"), "left_semi")
          .groupBy(col("u")).agg(count(lit(1)).as("c"))
          .agg(min(col("c"))).head()
      }
      graft.functions.CrossEngine.deleteRecursive(java.nio.file.Paths.get(out))
    }
    spark.stop()
  }
}
