package graft

import org.apache.spark.sql.SparkSession

/** The engine's session entry point: one place that encodes the
  * configuration contract every graft query assumes.
  *
  * - `spark.sql.legacy.parquet.nanosAsLong=true` — the corpus's `events`
  *   table stores TIMESTAMP(NANOS), which Spark only reads as a long under
  *   this flag ([[graft.sources.Tables.normalizeNanos]] converts it back);
  *   without it every events query fails with PARQUET_TYPE_ILLEGAL.
  * - AQE on — runtime re-planning + skew-join splitting.
  * - `spark.sql.shuffle.partitions` sized to the executor core count, not
  *   the 200 default (right for local / small clusters; at 1000 executors
  *   set it near total-cores or rely on AQE coalescing).
  * - UTC session timezone — oracle comparisons are timezone-free.
  *
  * `configure` applies the contract to any user-supplied builder (cluster
  * deployments); `local(cores)` is the one-liner used by the driver mains.
  */
object GraftSession {

  def configure(builder: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    builder
      // native-function SQL surface (l2_dist_sq, top_k_pairs, ... — see
      // GraftExtensions); equivalent to spark.sql.extensions on a cluster
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // ObjectHashAggregate falls back to SORT-BASED aggregation once a
      // partition sees >128 distinct groups (the default threshold) — for
      // the engine's bounded-heap TopKPairs lanes that silently turns the
      // map-side fold into a per-partition sort of EVERY scored row
      // (measured r11: a 200-probe kNN eval over 2M cells ran 127-194 s
      // fallen-back vs 9-13 s hash-based — the artifact r10 misread as a
      // storage ceiling). Heap state is bounded (~k pairs/group), so 4096
      // groups cost ~2 MB/partition; other object aggs here (collect_list
      // in block reassembly) carry doc-sized state, still ≤ ~40 MB at the
      // new threshold. Lanes needing more than 4096 groups per partition
      // should shard the probe/group panel (LisiRehearsal's shards arg).
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      // AQE partition coalescing sized by BYTES, not by default parallelism
      // (optimization guide §2.2): with parallelismFirst=true (the default)
      // every post-shuffle stage keeps >= defaultParallelism reduce tasks,
      // so the engine's many panel-bounded exchanges (beam walks, bounded
      // heaps, lifecycle witnesses — frames of 10^2..10^4 rows) each
      // schedule `cores` near-empty tasks; sized coalescing collapses them
      // to 1-2 tasks while corpus-scale exchanges keep their width. The
      // advisory stays DELIBERATELY small (16m vs the 64m default) so
      // CPU-heavy reduce stages keep parallelism at local scale; on a
      // cluster raise it toward 64-256m with executor count
      // (SPARK_GRAFT_ADVISORY_PARTITION overrides, same knob the guide
      // tunes). Measured r18: the graph/layered lifecycle family is
      // scheduling-bound (s42: 133 jobs, max 0.6 s) — task-count, not
      // data, is its wall.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY_PARTITION", "16m"))
      // The engine's index artifacts are BUCKETED directory tables (64-256
      // bucket= dirs by design, SURVEY §2.13); the default
      // parallelPartitionDiscovery.threshold (32) turns every scan of one
      // into a distributed file-listing JOB — pure scheduling overhead for
      // a bounded, per-table directory count. Driver-side listing of a few
      // hundred dirs is microseconds on any fs; the lifecycle lanes pay a
      // listing job per read without this (guide §6: listing/planning cost
      // is driver-side work — keep it off the cluster when it's bounded).
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "512")
      // Spark 4.1 writes a sidecar checksum file for EVERY streaming
      // checkpoint file (offset log, commit log, state deltas/snapshots) —
      // doubling the checkpoint's file-create + rename + fsync count per
      // micro-batch. The recovery gates (st24/st25/st27/st28) exercise
      // checkpoint RESTART semantics, which are unchanged by the integrity
      // sidecars (the manager reads files without checksums — it only
      // WARNs); a deployment on corruptible storage turns this back on.
      // Measured r18: the streaming lanes' wall is dominated by per-batch
      // non-job time (st28: 17.0 s wall, 9.4 s in Spark jobs).
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")

  def local(cores: Int, uiEnabled: Boolean = false): SparkSession = {
    val s = configure(SparkSession.builder(), cores)
      .master(s"local[$cores]")
      .config("spark.ui.enabled", uiEnabled.toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
