package graft.tools

import org.apache.spark.sql.functions._

/** Dev harness for the p09 corpus-export shard writer at volume: 1M
  * synthetic docs with a heavy-tailed token-count mix (the realistic
  * case for balance: a uniform corpus balances trivially), exported to
  * N ordered parquet shards + manifest. Verifies from the manifest
  * alone: docs and tokens conserved, position ranges tile 0..N-1 in
  * shard order, every shard's token count within one max-document of
  * the target; and spot-checks one shard's physical read-back order
  * against the manifest's order checksum. Prints the wall per stage.
  *
  * Usage: runMain graft.tools.ShardExportRehearsal [nMillions] [nShards]
  */
object ShardExportRehearsal {
  def main(args: Array[String]): Unit = {
    val nM = if (args.nonEmpty) args(0).toDouble else 1.0
    val nShards = if (args.length > 1) args(1).toInt else 64
    val n = (nM * 1e6).toLong

    val spark = graft.GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[shard] $label%-56s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // heavy-tailed token counts: 90% short (32..287), 9% medium
    // (512..2559), 1% long (8192..24575) — md5-deterministic
    val counted = spark.range(0, n, 1, 64)
      .select(col("id").as("doc_id"),
        expr("""CAST(conv(substring(md5(concat('len', CAST(id AS STRING))),
          1, 15), 16, 10) AS BIGINT)""").as("h"))
      .select(col("doc_id"),
        when(col("h") % 100 < 90, col("h") % 256 + 32)
          .when(col("h") % 100 < 99, col("h") % 2048 + 512)
          .otherwise(col("h") % 16384 + 8192).as("n_tokens"))

    val out = java.nio.file.Files.createTempDirectory("graft_shard_reh_")
    try {
      val manifest = timed(f"export ${nM}%.1fM docs -> $nShards shards") {
        graft.operators.Curation.exportShards(counted, "epoch1", nShards,
          s"$out/shards", s"$out/manifest").localCheckpoint(true)
      }
      val rows = manifest.collect().sortBy(_.getAs[Long]("shard_id"))
      val truth = counted.agg(count(lit(1)), sum(col("n_tokens")),
        max(col("n_tokens"))).head()
      val (nDocs, total, maxDoc) =
        (truth.getLong(0), truth.getLong(1), truth.getLong(2))
      assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs, "docs lost")
      assert(rows.map(_.getAs[Long]("shard_tokens")).sum == total,
        "tokens lost")
      assert(rows.head.getAs[Long]("first_pos") == 0L)
      assert(rows.last.getAs[Long]("last_pos") == nDocs - 1)
      rows.sliding(2).foreach {
        case Array(a, b) => assert(a.getAs[Long]("last_pos") + 1 ==
          b.getAs[Long]("first_pos"), "ranges do not tile")
        case _ =>
      }
      val target = (total + nShards - 1) / nShards
      val spread = rows.map(r => math.abs(
        r.getAs[Long]("shard_tokens") - target)).max
      assert(spread <= maxDoc,
        s"token balance off: spread $spread vs max doc $maxDoc")
      println(f"[shard] balance: target $target tokens/shard, max " +
        f"deviation $spread (${spread * 100.0 / target}%.2f%%, " +
        f"<= 1 doc = $maxDoc)")
      // physical order spot-check on the middle shard
      val mid = nShards / 2
      val ck = timed(s"read-back order check (shard $mid)") {
        val reread = spark.read.parquet(s"$out/shards/shard_id=$mid")
          .select(col("doc_id")).rdd.zipWithIndex()
          .map { case (r, idx) => (r.getLong(0), idx + 1L) }
        spark.createDataFrame(reread).toDF("doc_id", "rk")
          .select(sum(expr("""CAST(conv(substring(md5(CAST(doc_id AS
            STRING)), 1, 10), 16, 10) AS BIGINT) % 1048576""") * col("rk")))
          .head().getLong(0)
      }
      assert(ck == rows(mid).getAs[Long]("order_checksum"),
        "physical shard order diverged from the manifest")
      println(s"[shard] shard $mid read-back order matches the manifest")
    } finally {
      graft.functions.CrossEngine.deleteRecursive(out)
    }
    spark.stop()
  }
}
