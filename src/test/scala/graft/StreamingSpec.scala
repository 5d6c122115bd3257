package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Watermark / late-data / stateful-dedup semantics with MemoryStream —
  * the parts of the streaming surface the batch-oracle queries can't show. */
class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming gate bodies scope and RESTORE the session shuffle-partition conf") {
    // the st04-st09 bodies pin spark.sql.shuffle.partitions=8 for their
    // state stores; leaking that value would silently narrow every batch
    // query that runs after them in the shared Verify/Bench session
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    val n = SparkEntry.queries("st04_stream_tumbling")(spark, sfDir).count()
    assert(n > 0)
    assert(spark.conf.get(key) === before,
      "streaming body must restore the batch shuffle width")
  }

  test("append-mode tumbling window emits closed windows and drops late data") {
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext

    val input = MemoryStream[(Timestamp, String)]
    val agg = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("start"), col("k"), col("n"))

    val q = agg.writeStream.format("memory").queryName("wm_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two events in [10:00,10:10), one at 10:30 -> watermark 10:20
      input.addData(
        (ts("2024-01-01 10:00:00"), "a"),
        (ts("2024-01-01 10:05:00"), "a"),
        (ts("2024-01-01 10:30:00"), "a"))
      q.processAllAvailable()
      // batch 2: a LATE event for the already-closed 10:00 window (dropped),
      // plus 11:00 to advance the watermark past 10:40
      input.addData(
        (ts("2024-01-01 10:02:00"), "a"),
        (ts("2024-01-01 11:00:00"), "a"))
      q.processAllAvailable()

      val rows = sp.table("wm_sink").collect()
        .map(r => (r.getAs[Timestamp]("start").toString, r.getAs[Long]("n"))).toMap
      // the closed 10:00 window kept count 2 — the late event never landed
      assert(rows("2024-01-01 10:00:00.0") === 2L)
      // the 10:30 window closed with exactly its one on-time event
      assert(rows("2024-01-01 10:30:00.0") === 1L)
    } finally q.stop()
  }

  test("flatMapGroupsWithState keeps per-user running counts across batches") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext

    val input = MemoryStream[(Long, String)] // (user_id, event_type)
    val counted = input.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (user, events, state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          val next = prev + events.size
          state.update(next)
          Iterator((user, next))
      }.toDF("user_id", "running_n")

    val q = counted.writeStream.format("memory").queryName("state_sink")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData((1L, "a"), (1L, "b"), (2L, "a"))
      q.processAllAvailable()
      input.addData((1L, "c"))
      q.processAllAvailable()
      val last = sp.table("state_sink").groupBy("user_id")
        .agg(max("running_n").as("n")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(last === Map(1L -> 3L, 2L -> 1L))
    } finally q.stop()
  }

  test("foreachBatch sink: streaming micro-batches append to parquet") {
    import org.apache.spark.sql.{DataFrame, SaveMode}
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext

    val out = java.nio.file.Files.createTempDirectory("graft_fb_").toString
    val input = MemoryStream[(Long, Double)]
    val q = input.toDF().toDF("k", "v").writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode(SaveMode.Append).parquet(out)
      }
      .start()
    try {
      input.addData((1L, 1.0), (2L, 2.0))
      q.processAllAvailable()
      input.addData((3L, 3.0))
      q.processAllAvailable()
      val back = sp.read.parquet(out)
      assert(back.count() === 3)
      assert(back.select("batch_id").distinct().count() === 2)
    } finally q.stop()
  }

  test("stream-stream inner join with watermarked time-range condition") {
    import org.apache.spark.sql.streaming.OutputMode
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext

    val clicks = MemoryStream[(Timestamp, Long)]
    val views = MemoryStream[(Timestamp, Long)]
    val c = clicks.toDF().toDF("c_ts", "c_user").withWatermark("c_ts", "20 minutes")
    val v = views.toDF().toDF("v_ts", "v_user").withWatermark("v_ts", "20 minutes")
    // join views to clicks that happen within 10 minutes after the view
    val joined = v.join(c,
      expr("c_user = v_user AND c_ts >= v_ts AND c_ts <= v_ts + interval 10 minutes"))

    val q = joined.writeStream.format("memory").queryName("ssj_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      views.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:00:00"), 2L))
      clicks.addData(
        (ts("2024-01-01 10:05:00"), 1L),  // within range -> joins
        (ts("2024-01-01 10:20:00"), 2L))  // outside 10-min range -> dropped
      q.processAllAvailable()
      val rows = sp.table("ssj_sink").collect()
      assert(rows.length === 1)
      assert(rows.head.getAs[Long]("c_user") === 1L)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups repeated ids inside the delay") {
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext

    val input = MemoryStream[(Timestamp, Long)]
    val dedup = input.toDF().toDF("ts", "id")
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark(Seq("id"))

    val q = dedup.writeStream.format("memory").queryName("dd_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (ts("2024-01-01 09:00:00"), 1L),
        (ts("2024-01-01 09:01:00"), 1L), // dup, same batch
        (ts("2024-01-01 09:02:00"), 2L))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 09:03:00"), 1L)) // dup, later batch, in delay
      input.addData((ts("2024-01-01 09:10:00"), 3L))
      q.processAllAvailable()

      val ids = sp.table("dd_sink").select("id").as[Long].collect().sorted.toSeq
      assert(ids === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("session windows MERGE across micro-batches (the st08 semantics claim)") {
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext

    val input = MemoryStream[(Timestamp, Long, Double)]
    val sessions = input.toDF().toDF("ts", "user_id", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

    val q = sessions.writeStream.format("memory").queryName("sw_sink")
      .outputMode(OutputMode.Complete()).start()
    try {
      // batch 1: two events 20 min apart -> one open session
      input.addData(
        (ts("2024-01-01 09:00:00"), 1L, 1.0),
        (ts("2024-01-01 09:20:00"), 1L, 2.0))
      q.processAllAvailable()
      // batch 2: 09:45 is within 30 min of 09:20 -> MERGES into the same
      // session; 11:00 opens a new one
      input.addData(
        (ts("2024-01-01 09:45:00"), 1L, 4.0),
        (ts("2024-01-01 11:00:00"), 1L, 8.0))
      q.processAllAvailable()

      val rows = sp.table("sw_sink")
        .select(unix_timestamp(col("session_window.start")).as("start"),
          col("n_events"), col("sum_value"))
        .collect()
        .map(r => (r.getAs[Long]("start"), r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
        .sortBy(_._1)
      assert(rows.length === 2, s"expected merged + new session, got ${rows.toSeq}")
      assert(rows(0)._2 === 3L && rows(0)._3 === 7.0,
        "batch-2 event inside the gap must merge into the batch-1 session")
      assert(rows(1)._2 === 1L && rows(1)._3 === 8.0)
    } finally q.stop()
  }

  test("st16 streaming line dedup lands on exactly the batch d19 corpus") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[Long]("n_blocks"),
        r.getAs[Long]("n_removed"), r.getAs[String]("text_clean"))
    val batch = SparkEntry.queries("d19_line_dedup")(spark, sfDir).collect().map(key).toSet
    val stream = SparkEntry.queries("st16_stream_line_dedup")(spark, sfDir).collect().map(key).toSet
    assert(batch.nonEmpty)
    assert(stream === batch,
      "the streaming admission filter must produce the identical cleaned corpus")
  }

  test("st29 admission plan is genuinely STATELESS: no state store, no watermark, no agg") {
    // the lane's scale contract is that every verdict folds into the row,
    // so unbounded input needs zero state — pin it on the ANALYZED
    // streaming plan (a regression that sneaks in an aggregation or
    // dedup would change this shape, not just slow down)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val input = MemoryStream[(Long, String)]
    val verdicts = graft.operators.Curation.admissionVerdict(
      input.toDF().toDF("doc_id", "text"),
      hotHashes = Seq(42L), evalGramHashes = Seq(7L, 9L))
    assert(verdicts.isStreaming, "the verdict frame must stay a streaming frame")
    val q = verdicts.writeStream.format("memory").queryName("st29_spec_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, "hello world"), (2L, "more text here"))
      q.processAllAvailable()
      val plan = q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan
      val stateful = plan.collect {
        case s: org.apache.spark.sql.execution.streaming.operators.stateful.StateStoreWriter => s
      }
      assert(stateful.isEmpty, s"admission must plan ZERO stateful operators, saw $stateful")
      assert(q.lastProgress.stateOperators.isEmpty,
        "progress must report no state operators")
      assert(sp.table("st29_spec_sink").count() === 2L)
    } finally {
      q.stop()
      sp.catalog.dropTempView("st29_spec_sink")
    }
  }

  test("st17 NDV sketch state merges across micro-batches to the batch sketch") {
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val input = MemoryStream[Long]
    val k = 8
    val sketched = input.toDF().select(
        graft.functions.CrossEngine.md5Hash60(col("value")).as("h"))
      .agg(graft.functions.BottomK.bottomKDistinct(col("h"), k).as("bottom"))
    val q = sketched.writeStream.format("memory").queryName("st17_spec_sink")
      .outputMode(OutputMode.Complete()).start()
    try {
      // 30 distinct ids > k, split across two batches with overlap: the
      // state-store buffer must carry batch-1's heap into batch 2
      input.addData(0L until 20L: _*)
      q.processAllAvailable()
      input.addData(10L until 30L: _*)
      q.processAllAvailable()
      val streamed = sp.table("st17_spec_sink").collect().last.getSeq[Long](0)
      val batch = (0L until 30L).toDF("value")
        .select(graft.functions.CrossEngine.md5Hash60(col("value")).as("h"))
        .agg(graft.functions.BottomK.bottomKDistinct(col("h"), k).as("bottom"))
        .collect().head.getSeq[Long](0)
      assert(streamed === batch,
        "final streaming sketch must be bit-identical to the batch sketch")
      assert(streamed.length === k)
    } finally q.stop()
  }

  test("st18 count-min state merges across micro-batches to the batch sketch") {
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val input = MemoryStream[String]
    val sketched = input.toDF().select(col("value").as("k"))
      .agg(graft.functions.CountMin.countMinSketch(col("k"), 4, 32).as("cms"))
    val q = sketched.writeStream.format("memory").queryName("st18_spec_sink")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData((0 until 50).map(i => s"k${i % 7}"): _*)
      q.processAllAvailable()
      input.addData((0 until 30).map(i => s"k${i % 11}"): _*)
      q.processAllAvailable()
      val streamed = sp.table("st18_spec_sink").collect().last.getSeq[Long](0)
      val batch = ((0 until 50).map(i => s"k${i % 7}") ++
        (0 until 30).map(i => s"k${i % 11}")).toDF("k")
        .agg(graft.functions.CountMin.countMinSketch(col("k"), 4, 32).as("cms"))
        .collect().head.getSeq[Long](0)
      assert(streamed === batch,
        "final streaming CMS grid must be cell-identical to the batch sketch")
      assert(streamed.sum === 4L * 80)
    } finally q.stop()
  }

  test("st20 left-outer join equals the batch left join, nulls included") {
    val stream = SparkEntry.queries("st20_stream_left_outer_join")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("click_id"),
        if (r.isNullAt(r.fieldIndex("purch_id"))) -1L else r.getAs[Long]("purch_id")))
      .toSet
    val ev = graft.sources.Tables.events(spark, sfDir)
    val a = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("cu"), col("ts").as("cts"))
    val b = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purch_id"), col("user_id").as("pu"), col("ts").as("pts"))
    val batch = a.join(b, col("cu") === col("pu") &&
        col("pts") >= col("cts") &&
        col("pts") <= col("cts") + expr("INTERVAL 30 MINUTES"), "left_outer")
      .collect()
      .map(r => (r.getAs[Long]("click_id"),
        if (r.isNullAt(r.fieldIndex("purch_id"))) -1L else r.getAs[Long]("purch_id")))
      .toSet
    assert(stream === batch,
      "every unmatched click must flush as a null row before termination")
    // the outer semantics must actually fire: unconverted clicks exist
    assert(stream.exists(_._2 === -1L), "no null rows — outer emission never happened")
    assert(stream.exists(_._2 >= 0L), "no matched rows")
  }

  test("st22 streaming CDC apply lands on exactly the batch MERGE") {
    val stream = SparkEntry.queries("st22_stream_cdc_apply")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Long]("cents"))).toSet
    val batch = SparkEntry.queries("q65_merge_upsert")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Long]("cents"))).toSet
    assert(batch.nonEmpty)
    assert(stream === batch,
      "two sequential micro-batch merges must equal the one-shot batch MERGE")
  }

  test("st23 late rows are discarded: result equals batch minus the late slice") {
    val rows = SparkEntry.queries("st23_stream_late_drop")(spark, sfDir)
      .agg(sum(col("n_events"))).head().getLong(0)
    val ev = graft.sources.Tables.events(spark, sfDir)
    val onTime = ev.filter(col("event_id") % 17 =!= 3).count()
    val late = ev.filter(col("event_id") % 17 === 3).count()
    // exact discard accounting: every on-time event lands in exactly one
    // emitted window; not one late event leaks in
    assert(rows === onTime, s"emitted $rows events, expected $onTime")
    assert(late > 0, "the late slice must be non-empty for the test to bite")
  }

  test("st19 top-k heap state merges across micro-batches to the batch heap") {
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val sketched = input.toDF().toDF("g", "key", "payload")
      .groupBy(col("g"))
      .agg(graft.functions.TopK.topKPairs(col("key"), col("payload"), 3).as("top"))
    val q = sketched.writeStream.format("memory").queryName("st19_spec_sink")
      .outputMode(OutputMode.Complete()).start()
    try {
      // batch 2 must EVICT batch-1 heap entries: group a's batch-1 top-3
      // is (30,29,28) and batch 2 delivers larger keys — the state-store
      // heap must merge, not append
      input.addData((1L to 30L).map(i => ("a", i, 100 + i)): _*)
      q.processAllAvailable()
      input.addData(Seq(("a", 50L, 500L), ("a", 40L, 400L), ("b", 7L, 70L)): _*)
      q.processAllAvailable()
      val streamed = sp.table("st19_spec_sink")
        .select(col("g"), posexplode(col("top")).as(Seq("pos", "p")))
        .select(col("g"), col("pos"), col("p.sort_key"), col("p.payload"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2))
      assert(streamed.toSeq === Seq(
        ("a", 0, 50L, 500L), ("a", 1, 40L, 400L), ("a", 2, 30L, 130L),
        ("b", 0, 7L, 70L)),
        s"heap must evict across batches, got ${streamed.toSeq}")
    } finally q.stop()
  }

  test("st24 checkpoint recovery: resumed batch ids, no reprocessing, oracle-equal") {
    val rows = SparkEntry.queries("st24_stream_checkpoint_recovery")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val r = rows.head
    assert(r.getAs[Boolean]("multi_batch_run1"),
      "run 1 must commit >= 2 micro-batches before the stop")
    assert(r.getAs[Boolean]("resumed_not_restarted"),
      "run 2 must continue run 1's batch numbering from the checkpoint")
    assert(r.getAs[Boolean]("no_reprocessing"),
      "run 2 must read exactly the files that landed after the stop")
    // exactly-once end-to-end: the recovered stream's aggregate equals the
    // batch computation over the whole corpus
    val batch = graft.sources.Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n_events"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2))).sorted
    val streamed = rows
      .map(x => (x.getAs[Long]("window_start"), x.getAs[String]("event_type"),
        x.getAs[Long]("n_events"))).sorted
    assert(streamed.toSeq === batch.toSeq)
  }

  test("st25 custom-state recovery: span users keep full counts across restart") {
    val rows = SparkEntry.queries("st25_stream_state_recovery")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val r = rows.head
    assert(r.getAs[Boolean]("multi_batch_run1"))
    assert(r.getAs[Boolean]("resumed_not_restarted"),
      "run 2 must continue run 1's batch numbering")
    assert(r.getAs[Boolean]("no_reprocessing"),
      "run 2 must read exactly the late files")
    // per-user counts must equal the batch frame — only possible if run 2
    // deserialized and kept folding run 1's flatMapGroupsWithState state
    val batch = graft.sources.Tables.events(spark, sfDir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).sorted
    val streamed = rows
      .map(x => (x.getAs[Long]("user_id"), x.getAs[Long]("n_events"))).sorted
    assert(streamed.toSeq === batch.toSeq,
      "state store must reload across the restart (no loss, no double count)")
  }

  test("st27 join-state recovery: planted spans surface, organic matches batch-exact") {
    val rows = SparkEntry.queries("st27_stream_join_recovery")(spark, sfDir)
      .collect()
    val r = rows.head
    assert(r.getAs[Boolean]("multi_batch_run1"))
    assert(r.getAs[Boolean]("resumed_not_restarted"))
    assert(r.getAs[Boolean]("no_reprocessing"))
    assert(r.getAs[Boolean]("spanning_recovered"),
      "all 5 planted click-before/purchase-after pairs must join across the restart")
    // organic matches equal the batch interval join
    val batch = graft.sources.Tables.events(spark, sfDir).alias("a")
      .join(graft.sources.Tables.events(spark, sfDir).alias("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") === "click" && col("b.event_type") === "purchase" &&
          col("b.ts") >= col("a.ts") &&
          col("b.ts") <= col("a.ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("a.event_id"), col("b.event_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).sorted
    val streamed = rows
      .map(x => (x.getAs[Long]("click_id"), x.getAs[Long]("purch_id"))).sorted
    assert(streamed.toSeq === batch.toSeq)
  }

  test("st28 outer recovery: nulls flush exactly once across the restart") {
    val rows = SparkEntry.queries("st28_stream_outer_recovery")(spark, sfDir)
      .collect()
    val r = rows.head
    assert(r.getAs[Boolean]("multi_batch_run1"))
    assert(r.getAs[Boolean]("resumed_not_restarted"))
    assert(r.getAs[Boolean]("spanning_matched_not_flushed"),
      "planted spans must emit matched (never as a null flush)")
    // unmatched clicks must surface exactly once, nulls included
    val batchRows = graft.sources.Tables.events(spark, sfDir).alias("a")
      .join(graft.sources.Tables.events(spark, sfDir)
          .filter(col("event_type") === "purchase").alias("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.ts") >= col("a.ts") &&
          col("b.ts") <= col("a.ts") + expr("INTERVAL 30 MINUTES"),
        "left")
      .filter(col("a.event_type") === "click")
      .select(col("a.event_id"), col("b.event_id"))
      .collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).sorted
    val streamed = rows.map(x => (x.getAs[Long]("click_id"),
      if (x.isNullAt(x.fieldIndex("purch_id"))) -1L
      else x.getAs[Long]("purch_id"))).sorted
    assert(streamed.count(_._2 == -1L) > 0, "fixture must contain unmatched clicks")
    assert(streamed.toSeq === batchRows.toSeq,
      "outer result must equal the batch left join, nulls exactly once")
  }

  test("st35 graph admission: drained insertions equal batch s33, index frozen") {
    val rows = SparkEntry.queries("st35_stream_graph_admission")(spark, sfDir)
      .collect()
    val r = rows.head
    assert(r.getAs[Boolean]("multi_batch"),
      "arrivals must flow through >= 4 real micro-batches")
    assert(r.getAs[Boolean]("graph_frozen_through_stream"),
      "the persisted graph artifact must be bit-identical after the drain")
    // the whole point: drained search-then-link == the batch s33 append
    def key(x: org.apache.spark.sql.Row) = (x.getAs[Long]("node"),
      x.getAs[Long]("rnk"), x.getAs[Long]("neighbor_id"),
      x.getAs[Double]("dist_sq"))
    val batch = SparkEntry.queries("s33_graph_index_append")(spark, sfDir)
      .collect().map(key).sorted.toSeq
    assert(rows.map(key).sorted.toSeq === batch,
      "streamed admission diverged from the batch append on the same arrivals")
  }
  test("st36 hybrid serving: drained per-batch answers equal batch s35") {
    val rows = SparkEntry.queries("st36_stream_hybrid_serving")(spark, sfDir)
      .collect()
    def key(x: org.apache.spark.sql.Row) = (x.getAs[Long]("query_id"),
      x.getAs[Long]("rnk"), x.getAs[Long]("doc_id"),
      x.getAs[Double]("rrf_score"))
    val batch = SparkEntry.queries("s35_rrf_hybrid")(spark, sfDir)
      .collect().map(key).sorted.toSeq
    assert(rows.length === batch.length)
    assert(rows.map(key).sorted.toSeq === batch,
      "streamed hybrid serving diverged from the batch fusion on the same panel")
  }

  test("st37 lexical maintenance: merged index == recompute, serves == s35") {
    val rows = SparkEntry.queries("st37_stream_lexical_maintenance")(spark, sfDir)
      .collect()
    // the d20 contract, recomputed per table
    Seq("tf_merge_equals_recompute", "dl_merge_equals_recompute",
      "df_merge_equals_recompute", "meta_merge_equals_recompute").foreach { c =>
      assert(rows.forall(_.getAs[Boolean](c)), s"$c is false")
    }
    // serving from the MAINTAINED tables equals the batch fusion exactly
    def key(x: org.apache.spark.sql.Row) = (x.getAs[Long]("query_id"),
      x.getAs[Long]("rnk"), x.getAs[Long]("doc_id"),
      x.getAs[Double]("rrf_score"))
    val batch = SparkEntry.queries("s35_rrf_hybrid")(spark, sfDir)
      .collect().map(key).sorted.toSeq
    assert(rows.length === batch.length)
    assert(rows.map(key).sorted.toSeq === batch,
      "serving from the maintained index diverged from the frozen-index fusion")
  }

  test("st38 bloom admission: verdicts equal exact dedup, dups all pay the check") {
    val rows = SparkEntry.queries("st38_stream_bloom_admission")(spark, sfDir)
      .collect()
    assert(rows.length === 40)
    assert(rows.forall(_.getAs[Boolean]("multi_batch")))
    rows.foreach { r =>
      // the filter never changes the OUTCOME — admission == exact dedup
      assert(r.getAs[Boolean]("admitted") === !r.getAs[Boolean]("expected_dup"),
        s"probe ${r.getAs[Long]("probe_id")}: admission diverged from exact dedup")
      // no false negatives: every true duplicate hits the filter, so every
      // true duplicate pays the exact check (and only hits ever pay it)
      if (r.getAs[Boolean]("expected_dup"))
        assert(r.getAs[Boolean]("paid_exact_check"))
      assert(r.getAs[Boolean]("paid_exact_check") === r.getAs[Boolean]("in_filter"))
    }
  }

  test("st40 SCD2 maintenance: maintained dimension equals one-shot build") {
    val rows = SparkEntry.queries("st40_stream_scd2_maintenance")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("maintained_equals_oneshot"),
        "incremental SCD2 merge drifted from the one-shot batch build")
      assert(r.getAs[Boolean]("one_current_per_user"))
      assert(r.getAs[Boolean]("multi_batch"))
      assert(r.getAs[Long]("n_versions") >= r.getAs[Long]("n_current"))
    }
    // the dimension must actually version: changes outnumber users
    val ev = graft.sources.Tables.events(spark, sfDir)
    val nUsers = ev.filter(org.apache.spark.sql.functions.col("event_type") === "view")
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_versions")).sum > nUsers,
      "fixture produced no tier changes — the SCD2 path is untested")
  }

  test("st41 point-in-time enrichment: drained facts equal one-shot attribution") {
    val rows = SparkEntry.queries("st41_stream_pit_enrichment")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("drained_equals_batch"),
        "batch boundaries leaked into the enrichment verdicts")
      assert(r.getAs[Boolean]("multi_batch"))
    }
    val ev = graft.sources.Tables.events(spark, sfDir)
    val nPurch = ev.filter(
      org.apache.spark.sql.functions.col("event_type") === "purchase").count()
    assert(rows.map(_.getAs[Long]("n_purchases")).sum === nPurch,
      "every purchase must be enriched exactly once")
  }

  test("st42 graph maintenance: streamed op sequence equals batch, bytes pinned") {
    val r = SparkEntry.queries("st42_stream_graph_maintenance")(spark, sfDir)
      .head()
    assert(r.getAs[Boolean]("stream_equals_batch"),
      "the drained op-by-op artifact diverged from the batch sequence")
    assert(r.getAs[Boolean]("untouched_buckets_byte_identical"),
      "a maintenance op rewrote a bucket it never touched")
    assert(r.getAs[Boolean]("multi_batch"), "stream must run >= 3 triggers")
    // final content: every original node keeps its k = 6 rows unless a
    // doomed endpoint dropped some; the three doomed sources are gone
    val n = graft.operators.Similarity.nndPlantedVecs(spark, sfDir).count()
    // surviving sources = n - 3 originals (a 6-distinct-neighbor list can
    // never be fully doomed by a 3-node set) + the 20 appended twins
    val nSources = r.getAs[Long]("n_sources")
    assert(nSources >= n - 3 && nSources <= n - 3 + 20,
      s"n_sources $nSources vs corpus $n")
    assert(r.getAs[Long]("n_edges") > 0L)
  }

  test("st46 layered maintenance: four tables, streamed ops equal batch") {
    val rows = SparkEntry
      .queries("st46_stream_layered_maintenance")(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("tbl")).sorted.toSeq ===
      Seq("knn", "layer1", "layer2", "links"))
    rows.foreach { r =>
      val t = r.getAs[String]("tbl")
      assert(r.getAs[Boolean]("stream_equals_batch"),
        s"$t: drained artifact diverged from the batch sequence")
      assert(r.getAs[Boolean]("untouched_buckets_byte_identical"),
        s"$t: a maintenance op rewrote a bucket it never touched")
      assert(r.getAs[Boolean]("multi_batch"))
      assert(r.getAs[Long]("n_edges") > 0L, t)
    }
    // sources shrink up the hierarchy: corpus-wide base adjacency,
    // then the lvl>=1 subset, then the lvl>=2 subset
    val byT = rows.map(r => r.getAs[String]("tbl") -> r).toMap
    assert(byT("knn").getAs[Long]("n_sources") >
      byT("layer1").getAs[Long]("n_sources"))
    assert(byT("layer1").getAs[Long]("n_sources") >
      byT("layer2").getAs[Long]("n_sources"))
    // the takedown hit the base table: the doomed trio's sources are gone
    val n = graft.operators.Similarity.nndPlantedVecs(spark, sfDir).count()
    val nSrc = byT("knn").getAs[Long]("n_sources")
    assert(nSrc >= n - 3 && nSrc <= n - 3 + 20, s"knn n_sources $nSrc vs $n")
  }

  test("st47 dp ledger stream: three land, fourth refused, stream survives") {
    val rows = SparkEntry.queries("st47_stream_dp_ledger")(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("trigger_id"))
    assert(rows.length === 4)
    assert(rows.map(_.getAs[String]("outcome")).toSeq ===
      Seq("landed", "landed", "landed", "refused_eps"))
    rows.foreach { r =>
      assert(r.getAs[Boolean]("drained_equals_batch"))
      assert(r.getAs[Boolean]("ledger_exact"))
      assert(r.getAs[Boolean]("over_budget_refused"))
      assert(r.getAs[Boolean]("multi_batch"))
    }
    // landed releases carry real slice counts + noise; the refused
    // trigger publishes nothing (the -1 sentinel on both columns)
    val ev = graft.sources.Tables.events(spark, sfDir)
    val slices = ev.groupBy(pmod(col("event_id"), lit(4L)).as("i"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.take(3).foreach { r =>
      val i = r.getAs[Long]("trigger_id")
      assert(r.getAs[Long]("n_slice") === slices(i))
      assert(r.getAs[Double]("released_count") !== -1.0)
    }
    assert(rows.last.getAs[Long]("n_slice") === -1L)
    assert(rows.last.getAs[Double]("released_count") === -1.0)
  }

  test("st43 hll monitoring: drained partials merge == one-shot sketch exactly") {
    val rows = SparkEntry.queries("st43_stream_hll_ndv")(spark, sfDir)
      .collect()
    val ev = graft.sources.Tables.events(spark, sfDir)
    val nTypes = ev.select(org.apache.spark.sql.functions.col("event_type"))
      .distinct().count()
    assert(rows.length === nTypes, "one NDV row per event class")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("drained_equals_batch"),
        "merged per-batch HLL partials diverged from the one-shot sketch")
      assert(r.getAs[Boolean]("multi_batch"))
      assert(r.getAs[Boolean]("within_3sigma"),
        s"${r.getAs[String]("event_type")}: est ${r.getAs[Double]("hll_estimate")} " +
          s"vs exact ${r.getAs[Long]("exact_distinct")}")
    }
  }

  test("st44 dp release: exact partials, noise once at release, drained == batch") {
    val rows = SparkEntry.queries("st44_stream_dp_release")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("drained_agg_equals_batch"),
        "per-trigger exact partials diverged from the one-shot aggregate")
      assert(r.getAs[Boolean]("drained_release_equals_batch"),
        "the noised release diverged from the batch release")
      assert(r.getAs[Boolean]("multi_batch"))
    }
    // one release row per (event class, day window) present in the data
    val ev = graft.sources.Tables.events(spark, sfDir)
    val nKeys = ev.select(
        org.apache.spark.sql.functions.window(
          org.apache.spark.sql.functions.col("ts"), "1 day"),
        org.apache.spark.sql.functions.col("event_type"))
      .distinct().count()
    assert(rows.length === nKeys)
  }

  test("st45 exif admission: GPS stripped before write, classes as planted") {
    val rows = SparkEntry.queries("st45_stream_exif_admission")(spark, sfDir)
      .collect()
    val n = graft.sources.Tables.documents(spark, sfDir).count()
    assert(rows.length === n, "every arriving asset must be admitted")
    rows.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      assert(r.getAs[Boolean]("had_exif") === (d % 3 < 2))
      assert(r.getAs[Boolean]("had_gps") === (d % 3 == 0))
      assert(r.getAs[Boolean]("was_stripped") === (d % 3 == 0))
      assert(r.getAs[Boolean]("admitted_gps_free"),
        s"asset $d admitted with GPS intact")
      assert(r.getAs[Boolean]("all_admitted_gps_free"))
      assert(r.getAs[Boolean]("multi_batch"))
    }
  }

  test("st39 correction serving: drained stream equals one-shot batch serve") {
    val r = SparkEntry.queries("st39_stream_correction_serving")(spark, sfDir)
      .head()
    assert(r.getAs[Boolean]("drained_equals_batch_serve"),
      "micro-batch boundaries leaked into the served output")
    assert(r.getAs[Boolean]("cells_preserved"))
    assert(r.getAs[Boolean]("multi_batch"), "stream must run >= 4 micro-batches")
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    assert(r.getAs[Long]("n_served") ===
      emb.filter(org.apache.spark.sql.functions.col("vec_id") % 2 === 1).count())
  }
}
