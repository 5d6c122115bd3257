package graft.tools

import org.apache.spark.sql.functions._

/** Dev harness for the q83 epoch shuffle's 100 TB posture: the gate
  * proves the permutation cross-engine at gate sizes; this measures the
  * DECOMPOSITION at volume — the global seeded order computed from
  * 2^bucketBits partition-parallel bucket windows plus a driver
  * prefix-sum of 2^bucketBits longs, never a single global sort task.
  *
  * Per run it verifies position-exactness from the batch accounting
  * alone (sizes sum to N, ranges tile 0..N-1 gap-free, every batch is
  * position-tight — together those force the position multiset to be
  * exactly 0..N-1) and prints the wall, which should scale ~linearly in
  * N at fixed bucketBits; the bucketBits sweep shows the same corpus
  * under wider decompositions (more, smaller windows — the knob a
  * 100 TB run turns to fit executor memory).
  *
  * Usage: runMain graft.tools.EpochShuffleRehearsal [nMillions] [bucketBits]
  */
object EpochShuffleRehearsal {
  def main(args: Array[String]): Unit = {
    val nM = if (args.nonEmpty) args(0).toDouble else 10.0
    val bits = if (args.length > 1) args(1).toInt else 8
    val n = (nM * 1e6).toLong

    val spark = graft.GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[epoch] $label%-56s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    def drive(nn: Long, b: Int, seed: String): Unit = {
      val docs = spark.range(0, nn, 1, 64).select(col("id").as("doc_id"))
      val rows = timed(f"${nn / 1e6}%.0fM docs, 2^$b buckets, seed $seed") {
        graft.operators.Relational
          .epochShuffleBatchesOn(docs, seed, bucketBits = b)
          .collect()
      }.sortBy(_.getAs[Long]("batch_id"))
      // position-exactness from the accounting alone
      assert(rows.map(_.getAs[Long]("n_docs")).sum == nn, "sizes != N")
      assert(rows.head.getAs[Long]("first_pos") == 0L, "first pos != 0")
      assert(rows.last.getAs[Long]("last_pos") == nn - 1, "last pos != N-1")
      rows.sliding(2).foreach {
        case Array(a, c) =>
          assert(a.getAs[Long]("last_pos") + 1 == c.getAs[Long]("first_pos"),
            "batch ranges do not tile")
        case _ =>
      }
      rows.foreach(r => assert(
        r.getAs[Long]("last_pos") - r.getAs[Long]("first_pos") + 1 ==
          r.getAs[Long]("n_docs"), "batch not position-tight"))
      println(s"[epoch]   positions exact: ${rows.length} batches tile 0..${nn - 1}")
    }

    // N sweep at fixed bits: the wall should scale ~linearly
    Seq(n / 5, n / 2, n).foreach(nn => drive(nn, bits, "epoch1"))
    // bits sweep at fixed N: same corpus, wider decompositions
    Seq(bits, bits + 4).foreach(b => drive(n, b, "epoch1"))

    spark.stop()
  }
}
