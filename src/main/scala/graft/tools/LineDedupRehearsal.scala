package graft.tools

import org.apache.spark.sql.functions._

/** Scale rehearsal for corpus-level exact line dedup (d19,
  * `Dedup.lineDedup`) — the lane is pair-free by construction (grouped
  * document-frequency count + left-anti join back, never a doc×doc join),
  * so what matters at scale is (a) the HOT KEY: a site template shared by
  * half the corpus lands millions of identical block hashes on one grouped
  * count key (map-side combine must absorb it — the count is the ONLY
  * place the hot key concentrates, the anti-join side is one row), and
  * (b) the THRESHOLD boundary: blocks at df = maxDf−1 must survive
  * exactly.
  *
  * Plants, each with a closed-form expected `n_removed`:
  *  - TEMPLATE: nTmpl docs get a fixed 20-token template PREPENDED
  *    (two aligned blocks, df = nTmpl ≫ maxDf): n_removed = 2.
  *  - HOT BLOCK: docs [nDocs/2, nDocs/2 + nHot) get one shared 10-token
  *    block APPENDED (base is 40 tokens, so it aligns as block 4;
  *    df = nHot — the hot-key case): n_removed = 1.
  *  - EDGE: the last 49 docs share one appended block at df = 49 =
  *    maxDf − 1: n_removed = 0 (must survive — content, not template).
  *  - The random base corpus (40-token docs over an 800-word vocabulary,
  *    10-token block space 800¹⁰ ≈ 10²⁹) must come through UNTOUCHED.
  *
  * Usage: runMain graft.tools.LineDedupRehearsal [nDocs] [nTmpl] [nHot]
  */
object LineDedupRehearsal {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 1000000L
    val nTmpl = if (args.length > 1) args(1).toLong else nDocs / 5
    val nHot = if (args.length > 2) args(2).toLong else 2 * nDocs / 5
    require(nTmpl <= nDocs / 2 && nDocs / 2 + nHot <= nDocs - 49)
    val spark = graft.GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[linededup-scale] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val template = (0 until 20).map(i => s"tmpl$i").mkString(" ")
    val hotBlock = (0 until 10).map(i => s"hot$i").mkString(" ")
    val edgeBlock = (0 until 10).map(i => s"edge$i").mkString(" ")
    val baseToks = (0 until 40).map(j =>
      concat(lit("w"), pmod(xxhash64(col("doc_id"), lit(j)), lit(800))))
    val corpus = spark.range(0, nDocs, 1, 32).toDF()
      .select(col("id").as("doc_id"), concat_ws(" ", baseToks: _*).as("base"))
      .select(col("doc_id"), concat_ws(" ",
        when(col("doc_id") < nTmpl, lit(template)),
        col("base"),
        when(col("doc_id") >= nDocs / 2 && col("doc_id") < nDocs / 2 + nHot,
          lit(hotBlock)),
        when(col("doc_id") >= nDocs - 49, lit(edgeBlock))).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed(s"synthesize corpus($nDocs; tmpl $nTmpl, hot $nHot, edge 49)") {
      corpus.count()
    }

    val out = timed(s"lineDedup(blockTokens=10, maxDf=50)") {
      val o = graft.operators.Dedup.lineDedup(corpus, blockTokens = 10, maxDf = 50)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      o.count()
      o
    }

    def rmStats(from: Long, until: Long) = out
      .filter(col("doc_id") >= from && col("doc_id") < until)
      .agg(min("n_removed"), max("n_removed"), count(lit(1))).as[(Long, Long, Long)].head()

    val tmpl = rmStats(0, nTmpl)
    println(s"[linededup-scale]   template docs: n_removed min/max ${tmpl._1}/${tmpl._2} over ${tmpl._3} (expect 2/2)")
    assert(tmpl == ((2L, 2L, nTmpl)), "every template doc must lose exactly its 2 template blocks")

    val hot = rmStats(nDocs / 2, nDocs / 2 + nHot)
    println(s"[linededup-scale]   hot-block docs: n_removed min/max ${hot._1}/${hot._2} over ${hot._3} (expect 1/1; df=$nHot on one key)")
    assert(hot == ((1L, 1L, nHot)), "every hot-block doc must lose exactly the appended block")

    val edge = rmStats(nDocs - 49, nDocs)
    println(s"[linededup-scale]   edge docs (df=49=maxDf-1): n_removed min/max ${edge._1}/${edge._2} over ${edge._3} (expect 0/0)")
    assert(edge == ((0L, 0L, 49L)), "a df=maxDf-1 block must SURVIVE the threshold")

    val baseTouched = out
      .filter(col("doc_id") >= nTmpl && col("doc_id") < nDocs / 2 && col("n_removed") > 0)
      .count()
    println(s"[linededup-scale]   untouched base docs with removals: $baseTouched (expect 0)")
    assert(baseTouched == 0, "the random base corpus must pass through unchanged")

    spark.stop()
  }
}
