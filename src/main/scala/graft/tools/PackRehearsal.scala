package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale rehearsal for the t10 sequence-packing prefix sum — calls the
  * SAME `TextAnalysis.packSequences` implementation the gate query runs
  * (not a copy), over 100M generated docs — far beyond any window-based
  * cumsum.
  *
  * Validation is distributed (nothing row-sized on the driver): the final
  * doc's start offset + its tokens must equal the global token sum — any
  * mis-ordered partition or wrong offset breaks that telescoping identity.
  *
  * Usage: runMain graft.tools.PackRehearsal [nDocs]
  */
object PackRehearsal {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 100000000L
    val budget = 2048L
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")

    val t0 = System.nanoTime()
    val packed = graft.operators.TextAnalysis.packSequences(
      spark.range(nDocs)
        .select(col("id").as("doc_id"),
          (pmod(col("id") * 2654435761L, lit(97L)) + 3L).as("n_tokens")),
      budget)

    val check = packed.agg(
      count(lit(1)).as("n"),
      sum(col("n_tokens")).as("total_tokens"),
      max(struct(col("doc_id"), col("seq_id"), col("seq_offset"), col("n_tokens"))).as("last"))
      .head()
    val secs = (System.nanoTime() - t0) / 1e9
    val last = check.getStruct(2)
    val lastEnd = last.getLong(1) * budget + last.getLong(2) + last.getLong(3)
    println(f"docs=${check.getLong(0)} total_tokens=${check.getLong(1)} " +
      f"last_end=$lastEnd n_sequences=${(lastEnd + budget - 1) / budget} secs=$secs%.1f")
    assert(check.getLong(0) == nDocs)
    assert(lastEnd == check.getLong(1),
      "telescoping identity broken: a partition offset or ordering is wrong")
    spark.stop()
  }
}
