package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.MatrixMarket
import graft.harmony.{Harmony, HarmonyOptions, BlockMode}

/** MatrixMarket ingestion + the parquet adapter round trip. */
class SourcesSpec extends SparkSpec {

  test("MatrixMarket COO read: drops comments and dims header, parses entries") {
    val dir = Files.createTempDirectory("graft_mtx_")
    val mtx = dir.resolve("m.mtx")
    Files.writeString(mtx,
      """%%MatrixMarket matrix coordinate integer general
        |% a comment line
        |4 3 5
        |1 1 2
        |2 1 7
        |3 2 1
        |4 3 9
        |2 3 4
        |""".stripMargin)
    val coo = MatrixMarket.readCoo(spark, mtx.toString)
    assert(coo.count() === 5)
    val top = coo.filter(col("row_id") === 2 && col("col_id") === 1).head()
    assert(top.getDouble(2) === 7.0)
    assert(coo.agg(max("row_id"), max("col_id")).head().toSeq === Seq(4L, 3L))
  }

  test("MatrixMarket names read: 1-based positional dimension table") {
    val dir = Files.createTempDirectory("graft_mtx_")
    val tsv = dir.resolve("barcodes.tsv")
    Files.writeString(tsv, "AAAC\nGGGT\nTTTA\n")
    val names = MatrixMarket.readNames(spark, tsv.toString).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(names === Map(1L -> "AAAC", 2L -> "GGGT", 3L -> "TTTA"))
  }

  test("runParquet adapter writes corrected embeddings + per-component stdev") {
    val out = Files.createTempDirectory("graft_adapter_").toString
    val in = Files.createTempDirectory("graft_adapter_in_").toString
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("cell_id"),
        col("embedding").as("features"),
        col("label").cast("string").as("batch"))
      .write.mode("overwrite").parquet(in)
    Harmony.runParquet(spark, in, out, Seq("batch"),
      HarmonyOptions(nclust = Some(8), maxIterHarmony = 1, maxIterCluster = 1,
        earlyStop = false, blockMode = BlockMode.Sweep))
    val corrected = spark.read.parquet(s"$out/corrected")
    assert(corrected.count() === 500)
    val stdev = spark.read.parquet(s"$out/stdev")
    assert(stdev.count() === 64)
    assert(stdev.filter(col("stdev") <= 0 || col("stdev").isNull).count() === 0)
  }

  test("runParquet projectDimFrom: loadings = expr x CORRECTED embedding (ProjectDim analogue)") {
    val out = Files.createTempDirectory("graft_adapter_pd_").toString
    val in = Files.createTempDirectory("graft_adapter_pd_in_").toString
    val cooDir = Files.createTempDirectory("graft_adapter_pd_coo_").toString
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("cell_id"),
        col("embedding").as("features"),
        col("label").cast("string").as("batch"))
      .write.mode("overwrite").parquet(in)
    // two genes: g0 touches every cell with weight 1, g1 even cells with 2
    val sp = spark
    import sp.implicits._
    val ids = spark.read.parquet(in).select(col("cell_id"))
      .as[Long].collect().sorted
    ids.toSeq.flatMap(c =>
        Seq((c, 0, 1.0)) ++ (if (c % 2 == 0) Seq((c, 1, 2.0)) else Nil))
      .toDF("cell_id", "gene_idx", "value")
      .write.mode("overwrite").parquet(cooDir)
    Harmony.runParquet(spark, in, out, Seq("batch"),
      HarmonyOptions(nclust = Some(8), maxIterHarmony = 1, maxIterCluster = 1,
        earlyStop = false, blockMode = BlockMode.Sweep),
      projectDimFrom = Some(cooDir))
    val emb = spark.read.parquet(s"$out/corrected").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val d = emb.head._2.length
    val loadings = spark.read.parquet(s"$out/loadings").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    assert(loadings.keySet === Set(0, 1))
    def expected(pred: Long => Boolean, w: Double): Array[Double] =
      Array.tabulate(d)(j =>
        emb.collect { case (id, v) if pred(id) => v(j).toDouble * w }.sum)
    val e0 = expected(_ => true, 1.0)
    val e1 = expected(_ % 2 == 0, 2.0)
    Seq((loadings(0), e0), (loadings(1), e1)).foreach { case (got, exp) =>
      assert(got.length === d)
      (got zip exp).foreach { case (g, e) =>
        assert(math.abs(g - e) <= 1e-6 * math.max(1.0, math.abs(e)),
          s"loading mismatch: $g vs $e") }
    }
  }
  test("w08 WET reader survives file-split-straddling records") {
    // the scale claim: lineSep record reading is safe under
    // maxPartitionBytes because Hadoop's reader resynchronizes at the
    // first boundary after each split start — force MANY splits so most
    // records straddle one, and demand byte-exact recovery
    val out = Files.createTempDirectory("graft_w08_spec_").toString
    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(key)
    try {
      val docs = graft.sources.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
      docs.select(concat(
          lit("WARC/1.0\nWARC-Target-URI: http://h/doc/"), col("doc_id").cast("string"),
          lit("\nContent-Length: "), length(col("text")).cast("string"),
          lit("\n\n"), col("text")).as("value"))
        .coalesce(1).write.mode("overwrite").text(out)
      spark.conf.set(key, "1024") // ~3-6 records per split at sf0.001
      val recovered = spark.read.option("lineSep", "WARC/1.0\n").text(out)
        .filter(length(col("value")) > 0)
        .select(
          regexp_extract(col("value"), "/doc/([0-9]+)", 1).cast("long").as("doc_id"),
          md5(regexp_replace(element_at(split(col("value"), "\n\n", 2), 2), "\n$", ""))
            .as("h"))
      assert(recovered.rdd.getNumPartitions > 3,
        "the test must actually produce many splits")
      val got = recovered.collect().map(r => (r.getLong(0), r.getString(1))).sorted
      val want = docs.select(col("doc_id"), md5(col("text")))
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted
      assert(got.toSeq === want.toSeq, "split-straddling records must parse exactly")
    } finally {
      spark.conf.set(key, prev)
      graft.functions.CrossEngine.deleteRecursive(java.nio.file.Paths.get(out))
    }
  }
  test("w11 gzip members: concatenated-member decode, per-file parallelism") {
    // one task per .gz file (gzip is not splittable) and the JDK reader
    // must consume ALL concatenated members, not stop after the first
    val out = Files.createTempDirectory("graft_w11_spec_").toString
    try {
      val os = new java.io.FileOutputStream(s"$out/two_members.wet.gz")
      Seq("WARC/1.0\nWARC-Target-URI: http://h/doc/1\nContent-Length: 5\n\nhello\n",
          "WARC/1.0\nWARC-Target-URI: http://h/doc/2\nContent-Length: 5\n\nworld\n")
        .foreach { rec =>
          val gz = new java.util.zip.GZIPOutputStream(os)
          gz.write(rec.getBytes("UTF-8")); gz.finish()
        }
      os.close()
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$out/two_members.wet.gz"))
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val text = new String(in.readAllBytes(), "UTF-8")
      assert(text.split("WARC/1\\.0\n").count(_.nonEmpty) === 2,
        "both gzip members must decode")
      assert(text.contains("hello") && text.contains("world"))
      // per-file task parallelism on the binaryFile scan
      val files = spark.read.format("binaryFile").load(out)
      assert(files.count() === 1L)
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$out/two_members.wet.gz"),
        java.nio.file.Paths.get(s"$out/copy2.wet.gz"))
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$out/two_members.wet.gz"),
        java.nio.file.Paths.get(s"$out/copy3.wet.gz"))
      val rdd = spark.read.format("binaryFile").load(out).rdd
      assert(rdd.getNumPartitions >= 2,
        "multiple .gz files must scan as multiple tasks")
    } finally {
      graft.functions.CrossEngine.deleteRecursive(java.nio.file.Paths.get(out))
    }
  }
}
