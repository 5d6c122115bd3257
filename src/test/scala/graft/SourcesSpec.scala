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
          md5(regexp_replace(element_at(split(col("value"), "\n\n", 2), 2), "\n\\z", ""))
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
  test("wetParse strips exactly ONE record terminator (doc text ending in \\n survives)") {
    // ADVICE r10: "\n$" in Java regex also matches before a final line
    // terminator, so a payload whose own text ends with "\n" lost it on
    // the roundtrip. wetParse now anchors with \z; prove the byte-exact
    // contract on exactly that adversarial payload.
    val out = Files.createTempDirectory("graft_wet_nl_spec_").toString
    try {
      val sp = spark
      import sp.implicits._
      val docs = Seq((1L, "plain"), (2L, "ends with newline\n"),
        (3L, "two newlines\n\n"), (4L, "\nstarts and ends\n")).toDF("doc_id", "text")
      graft.operators.Sinks.wetWrite(docs, out, nFiles = 1)
      val got = graft.operators.Sinks.wetParse(
          spark.read.option("lineSep", "WARC/1.0\n").text(out))
        .select(regexp_extract(col("uri"), "/doc/([0-9]+)$", 1).cast("long"),
          col("body"), (col("clen") === length(col("body"))).as("len_ok"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
        .sortBy(_._1)
      val want = docs.collect().map(r => (r.getLong(0), r.getString(1), true)).sortBy(_._1)
      assert(got.toSeq === want.toSeq,
        "payload bytes incl. trailing newlines must roundtrip exactly")
    } finally {
      graft.functions.CrossEngine.deleteRecursive(java.nio.file.Paths.get(out))
    }
  }
  test("w12 length-framed WARC: boundary-token payloads survive; token reader shears") {
    // the adversarial corpus: every doc's payload EMBEDS a full decoy
    // record header ("WARC/1.0" line + fake Content-Length + blank line)
    val out = Files.createTempDirectory("graft_w12_spec_").toString
    try {
      val sp = spark
      import sp.implicits._
      val docs = Seq(
        (1L, "plain text"),
        (2L, "quoting the spec:\nWARC/1.0\nContent-Length: 999999\n\nis legal in a crawled page"),
        (3L, "ends with newline\n"),
        (4L, "WARC/1.0\nstarts with the token")).toDF("doc_id", "text")
      graft.operators.Sinks.warcWrite(docs, out, nFiles = 1)
      val bytes = java.nio.file.Files.list(java.nio.file.Paths.get(out)).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.getFileName.toString.startsWith("part-"))
        .flatMap(java.nio.file.Files.readAllBytes)
      // length-framed reader: byte-exact recovery of all 4 payloads
      val recs = graft.operators.Sinks.warcFrame(bytes)
      assert(recs.length === 4, s"expected 4 records, got ${recs.length}")
      val got = graft.operators.Sinks.wetParse(recs.toDF("value"))
        .select(regexp_extract(col("uri"), "/doc/([0-9]+)$", 1).cast("long"), col("body"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      val want = docs.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      assert(got.toSeq === want.toSeq, "length framing must recover payloads byte-exactly")
      // negative control: the token-split formulation shears these payloads
      val sheared = new String(bytes, "UTF-8").split("WARC/1\\.0\n").count(_.nonEmpty)
      assert(sheared > 4, s"token split should shear the planted payloads (got $sheared)")
      // graceful truncation: cutting the file mid-payload yields only whole records
      val cut = bytes.take(bytes.length - 10)
      val partial = graft.operators.Sinks.warcFrame(cut)
      assert(partial.length < 4 && partial.nonEmpty, "truncation stops at last whole record")
      // malformed declared length: stops cleanly, no throw
      val bad = new String(bytes, "UTF-8").replaceFirst("Content-Length: [0-9]+", "Content-Length: 999999")
      assert(graft.operators.Sinks.warcFrame(bad.getBytes("UTF-8")).isEmpty)
    } finally {
      graft.functions.CrossEngine.deleteRecursive(java.nio.file.Paths.get(out))
    }
  }
  test("w13 OCC: a REAL two-thread race — exactly one winner per version, no lost update") {
    // the gate pins the protocol branches deterministically; this races the
    // atomic-create primitive for real: two writers commit concurrently
    // from the same base. CREATE_NEW guarantees exactly one claims v2; the
    // other must land v3 with BOTH changes present in the final manifest.
    val root = Files.createTempDirectory("graft_w13_spec_")
    try {
      val sp = spark
      import sp.implicits._
      val t = new graft.operators.Sinks.OccTable(root)
      def writeBucket(df: org.apache.spark.sql.DataFrame, name: String): String = {
        val d = root.resolve(name).toString
        df.coalesce(1).write.mode("overwrite").parquet(d)
        new java.io.File(d).listFiles().find(_.getName.endsWith(".parquet")).get.getPath
      }
      val v1 = (0 until 4).map { b =>
        b -> writeBucket(Seq.tabulate(25)(i => (i * 4 + b, 100L)).toDF("k", "cents"),
          s"b${b}_v1")
      }.toMap
      Files.write(root.resolve("manifest_v1.txt"),
        ("init" +: v1.toSeq.sortBy(_._1).map { case (b, p) => s"$b\t$p" })
          .mkString("\n").getBytes("UTF-8"))
      // pre-write both writers' files (Spark jobs stay on the main thread;
      // the RACED section is the commit protocol itself)
      val fa = writeBucket(spark.read.parquet(v1(0)).withColumn("cents", col("cents") + 1L), "b0_A")
      val fb = writeBucket(spark.read.parquet(v1(1)).withColumn("cents", col("cents") + 2L), "b1_B")
      import java.util.concurrent.{CountDownLatch, Executors}
      val pool = Executors.newFixedThreadPool(2)
      val gate = new CountDownLatch(1)
      def racer(id: String, b: Int, f: String) = pool.submit(
        new java.util.concurrent.Callable[(Int, Int, Int)] {
          def call(): (Int, Int, Int) = {
            gate.await()
            t.commit(id, 1, Map(b -> f),
              _ => sys.error(s"$id touched a disjoint bucket; must rebase"))
          }
        })
      val (ra, rb) = (racer("A", 0, fa), racer("B", 1, fb))
      gate.countDown()
      val (va, vb) = (ra.get(), rb.get())
      pool.shutdown()
      assert(Set(va._1, vb._1) === Set(2, 3), s"got versions ${(va, vb)}")
      assert(va._3 === 0 && vb._3 === 0, "disjoint race must never re-execute")
      assert(t.latest() === 3)
      val (_, fin) = t.read(3)
      assert(fin(0) === fa && fin(1) === fb,
        "both racers' changes must survive in the final version")
      assert(fin(2) === v1(2) && fin(3) === v1(3), "untouched buckets reused")
    } finally {
      graft.functions.CrossEngine.deleteRecursive(root)
    }
  }
  test("w12 warcFrame property: random adversarial payloads roundtrip byte-exactly") {
    // the framing spec under fire: 200 seeded-random payloads over a
    // charset that includes newlines, boundary-token fragments, FULL fake
    // record headers, and multibyte UTF-8 (Content-Length counts BYTES —
    // the one edge the all-ASCII gate corpus never exercises)
    val rng = new scala.util.Random(4242)
    val atoms = Array("a", "b", " ", "\n", "\n\n", "WARC/1.0", "WARC/1.0\n",
      "\nWARC/1.0\nContent-Length: 3\n\nxyz", "Content-Length: 99\n",
      "é", "中文", "é\n", "end\n")
    val payloads = (0 until 200).map { i =>
      if (i == 0) "" // empty payload
      else if (i == 1) "WARC/1.0\n" // payload IS the boundary token
      else (0 until rng.nextInt(12)).map(_ => atoms(rng.nextInt(atoms.length))).mkString
    }
    val bytes = payloads.zipWithIndex.flatMap { case (p, i) =>
      val body = p.getBytes("UTF-8")
      (s"WARC/1.0\nWARC-Target-URI: http://h/doc/$i\n" +
        s"Content-Length: ${body.length}\n\n").getBytes("UTF-8") ++ body ++ "\n".getBytes("UTF-8")
    }.toArray
    val recs = graft.operators.Sinks.warcFrame(bytes)
    assert(recs.length === payloads.length, s"framed ${recs.length}/${payloads.length}")
    val sp = spark
    import sp.implicits._
    val got = graft.operators.Sinks.wetParse(recs.toDF("value"))
      .select(regexp_extract(col("uri"), "/doc/([0-9]+)$", 1).cast("int").as("i"),
        col("body"), (col("clen") === octet_length(col("body"))).as("len_ok"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getBoolean(2)))
      .sortBy(_._1)
    got.zip(payloads.zipWithIndex).foreach { case ((i, body, lenOk), (want, j)) =>
      assert(i === j)
      assert(body === want, s"payload $j mismatch: ${body.take(40)} vs ${want.take(40)}")
      assert(lenOk, s"payload $j byte count must match the declared Content-Length")
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
