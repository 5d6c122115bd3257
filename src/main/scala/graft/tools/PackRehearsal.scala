package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale rehearsal for the t10 sequence-packing prefix sum: the same
  * two-pass pattern (range partition + sort, per-partition totals
  * prefix-summed on the driver, narrow offset-adding sweep) over 100M
  * generated docs — far beyond any window-based cumsum.
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
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val t0 = System.nanoTime()
    val counted = spark.range(nDocs)
      .select(col("id").as("doc_id"), (pmod(col("id") * 2654435761L, lit(97L)) + 3L).as("n_tokens"))
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .as[(Long, Long, Int)]
      .persist()
    val partTotals = counted.groupBy(col("pid"))
      .agg(sum(col("n_tokens")).as("tot")).collect()
      .map(r => (r.getAs[Int]("pid"), r.getAs[Long]("tot"))).sortBy(_._1)
    val offsets: Map[Int, Long] = {
      var acc = 0L
      partTotals.map { case (pid, tot) => val off = acc; acc += tot; pid -> off }.toMap
    }
    val packed = counted.mapPartitions { it =>
      var curPid = -1
      var cum = 0L
      it.map { case (docId, n, pid) =>
        if (pid != curPid) { curPid = pid; cum = offsets(pid) }
        val start = cum; cum += n
        (docId, n, start / budget, start % budget)
      }
    }.toDF("doc_id", "n_tokens", "seq_id", "seq_offset")

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
