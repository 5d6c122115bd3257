package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Q
import graft.sources.Tables

/** Deduplication operators for LLM training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design: nothing here ever builds an N² candidate space. Exact dedup
  * groups on a content hash (shuffles 16-byte keys, not documents);
  * MinHash/SimHash reduce each document to a fixed-width signature (one
  * shuffle of shingles with map-side combine), and candidate generation is a
  * self-equi-join on band buckets — the classic shuffle-join-on-bucket plan
  * that stays linear in corpus size for bounded bucket width.
  *
  * The synthetic corpus has almost no organic near-duplicates (a handful
  * exist at sf0.001), so the near-dup queries plant deterministic ones
  * (a truncated copy of every 10th doc) inside the query itself — the
  * pipeline must find at least exactly those.
  */
object Dedup {

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.operators.Dedup")

  private def toks: Column = split(col("text"), " ")

  /** 90%-token-prefix truncation of `text` — the planted-near-dup
    * derivation shared by [[withPlantedDups]] (batch) and the streaming
    * ingest harness (st10); int cast = floor for positive counts, matching
    * the oracle's floor(). ONE definition so the Spark sides cannot drift
    * from each other (the SQL twin lives in [[sqlPlanted]]). */
  private[graft] def truncate90: Column =
    array_join(slice(toks, lit(1),
      greatest((size(toks) * 0.9).cast("int"), lit(1))), " ")

  /** Per-bucket width cap against degenerate HOT buckets (VERDICT r4 #4):
    * thousands of near-identical documents (license pages, boilerplate,
    * scraped templates — exactly what a 100 TB web corpus contains) land in
    * ONE band bucket, and the candidate self-join inside that bucket goes
    * quadratic. Buckets wider than `cap` are split into ceil(w/cap)
    * deterministic sub-buckets by id hash, so the per-bucket join cost
    * drops from w² to ~w·cap — linear in w at fixed cap.
    *
    * Tradeoff, stated not hidden: pairs BETWEEN sub-buckets of a hot bucket
    * are not generated (recall inside over-cap buckets is partial; each doc
    * still pairs within its sub-bucket, so connected-components clustering
    * recovers group structure per sub-bucket). Identical-text floods should
    * be removed by exact dedup (d01) before near-dup LSH — this cap is the
    * backstop that keeps the job bounded when they are not. Capped buckets
    * are counted and logged, never silently dropped (the no-silent-caps
    * contract); at the gate's corpus scale no bucket approaches the default
    * cap, so the planted-recall invariants (d11/d12/d13) see byte-identical
    * results.
    *
    * The width count is one extra grouped agg, NOT one extra pipeline pass:
    * the banded frame and its counts are persisted, so the stats job that
    * feeds the log line materializes exactly the rows the subsequent pair
    * join reads back from cache. Callers must invoke the returned cleanup
    * thunk once their result is materialized (all three call sites
    * eagerly localCheckpoint their pairs, so nothing stays cached across
    * calls — the r4 leak-class contract). */
  private[graft] def capHotBuckets(banded0: DataFrame, keys: Seq[String], idCol: String,
      cap: Int, what: String): (DataFrame, () => Unit) = {
    if (cap <= 0) (banded0.withColumn("sub", lit(0L)), () => ())
    else {
      import org.apache.spark.sql.expressions.Window
      // width via an UNORDERED count window: one hash exchange on the
      // bucket key that KEEPS the rows (a groupBy+join would shuffle the
      // banded rows twice); no orderBy, so no rank-over-hot-key sort — the
      // hot bucket's rows land in one partition and are counted in O(w)
      val withW = banded0
        .withColumn("w", count(lit(1)).over(Window.partitionBy(keys.map(col): _*)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val hot = withW.filter(col("w") > cap)
        .agg(countDistinct(struct(keys.map(col): _*)).as("n_hot"),
          max(col("w")).as("widest")).head()
      if (hot.getLong(0) > 0) {
        log.warn(s"$what: splitting ${hot.getLong(0)} hot bucket(s) wider than " +
          s"$cap (widest ${hot.getLong(1)}) into hash sub-buckets; " +
          "cross-sub-bucket pairs inside those buckets are not generated")
      }
      // the sub-bucket hash is salted with the bucket key columns, so each
      // BAND splits a hot bucket independently: a pair separated in one
      // band's split still co-buckets in another band with probability
      // 1-(1-1/nSub)^bands — the OR-redundancy multi-band LSH exists for
      // is preserved inside hot buckets (id-only hashing would split the
      // pair identically in every band and forfeit it)
      val capped = withW
        .withColumn("sub", when(col("w") <= cap, lit(0L))
          .otherwise(pmod(xxhash64((keys.map(col) :+ col(idCol)): _*),
            ceil(col("w").cast("double") / cap))))
        .drop("w")
      (capped, () => { withW.unpersist(false); () })
    }
  }

  /** Connected components over an undirected edge list (`src`, `dst`) by
    * hash-to-min label propagation: label(v) <- min(label(v), min of
    * neighbor labels), iterated to fixpoint. Returns (`node`, `label`)
    * where label = min node id in the component.
    *
    * Scale: each round is one shuffle join on node ids plus a map-side
    * combined min-agg; labels re-persist and swap per round so lineage
    * stays flat. Convergence detection is a single tiny agg per round —
    * labels only ever DECREASE under min-propagation, so an unchanged
    * sum(label) is a fixpoint — no per-round join against the previous
    * labels. Rounds needed = component diameter (near-dup clusters are
    * shallow re-post chains: 2-4). For adversarially deep graphs swap in
    * large-star/small-star (Kiveris et al.), same primitives, O(log n).
    *
    * Each round's labels are truncated with an eager `localCheckpoint` —
    * persist alone leaves the logical plan growing by one join+union per
    * round, which explodes `generateTreeString` after ~10 rounds (same
    * lesson as the harmony block-online sweeps; on a multi-node cluster
    * swap for reliable `checkpoint()` via `sc.setCheckpointDir`). */
  def connectedComponents(edges: DataFrame, maxIters: Int = 20): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // (measured dead end: pre-repartitioning this by `dst` to co-locate the
    // per-round join buys nothing — the localCheckpoint boundary erases
    // outputPartitioning from the planner's view, so the join re-exchanges
    // regardless and the upfront shuffle is pure overhead)
    // self-loops carry no connectivity and are dropped — BOTH variants
    // treat a self-loop-only node as absent (like any isolated node), so
    // the algorithms stay output-identical and interchangeable
    val und = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst"))
        .filter(col("src") =!= col("dst")))
      .persist(lvl)
    // checkpoints in this loop are LAZY: the labelSum fixpoint probe right
    // after each one materializes it, so each round is ONE job instead of
    // the r18 two (eager checkpoint count + sum) — the composite lanes
    // that embed CC are scheduling-bound, not data-bound (guide §1.2)
    var labels = und.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(false)
    // sum over zero rows is null: an empty edge set must return empty
    // labels, not NPE (star variant null-guards its signature the same way)
    def labelSum(d: DataFrame): Long = {
      val r = d.agg(sum(col("label"))).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    var prevSum = labelSum(labels)

    var converged = false
    var iters = 0
    while (!converged && iters < maxIters) {
      val prev = labels
      labels = und.join(prev.withColumnRenamed("node", "dst"), Seq("dst"))
        .select(col("src").as("node"), col("label"))
        .unionByName(prev)
        .groupBy(col("node")).agg(min(col("label")).as("label"))
        .localCheckpoint(false)
      val s = labelSum(labels) // materializes the lazy checkpoint
      prev.unpersist(false)
      converged = s == prevSum
      prevSum = s
      iters += 1
    }
    if (!converged) {
      und.unpersist(false)
      labels.unpersist(false)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds " +
          "(component diameter exceeds the budget); use connectedComponentsStar " +
          "for deep graphs or raise maxIters")
    }
    und.unpersist(false)
    labels
  }

  /** Connected components by alternating LARGE-STAR / SMALL-STAR rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    * the O(log n)-round alternative to hash-to-min for graphs whose
    * component diameter is NOT small: hash-to-min needs diameter rounds,
    * star contraction needs ~log rounds regardless of diameter.
    *
    * large-star: every node u computes m = min({u} ∪ N(u)) and re-points
    * its strictly-larger neighbors at m. small-star (on (big, small)
    * oriented edges): every node u re-points its smaller neighbors — and
    * itself — at its minimum neighbor. Each phase is one groupBy-min plus
    * one join (re-expand neighbors against the group minimum); edges are
    * localCheckpoint-truncated per round. Fixpoint = (count, sum(src),
    * sum(dst)) unchanged; at fixpoint the edge set IS the star
    * node → component-min, which is returned as (node, label). */
  def connectedComponentsStar(edges0: DataFrame, maxIters: Int = 50): DataFrame = {
    def largeStar(e: DataFrame): DataFrame = {
      val dir = e.select(col("src").as("u"), col("dst").as("v"))
        .unionByName(e.select(col("dst").as("u"), col("src").as("v")))
      val mins = dir.groupBy(col("u"))
        .agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      dir.join(mins, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))
      val mins = dir.groupBy(col("u")).agg(min(col("v")).as("m"))
      dir.join(mins, Seq("u"))
        .select(col("v").as("src"), col("m").as("dst"))
        .unionByName(mins.select(col("u").as("src"), col("m").as("dst")))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }
    // lazy checkpoints: each round's sig() probe materializes the frame,
    // halving the per-round job count (see connectedComponents above)
    var e = edges0.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(false)
    // fixpoint signature: count + column sums + an order-independent hash
    // (sums alone could collide across distinct edge sets and stop the
    // loop one round early with wrong labels; xxhash64 makes that
    // astronomically unlikely). EVERY summed term is pmod-bounded so the
    // sums can't overflow ANSI long arithmetic — raw id sums would throw
    // ARITHMETIC_OVERFLOW at ~1e9 edges with ~1e12 node ids, well inside
    // the sizes this variant exists for.
    def sig(d: DataFrame): (Long, Long, Long, Long) = {
      val r = d.agg(count(lit(1)),
        sum(pmod(col("src"), lit(1000000007L))),
        sum(pmod(col("dst"), lit(1000000007L))),
        sum(pmod(xxhash64(col("src"), col("dst")), lit(1000000007L)))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2),
        if (r.isNullAt(3)) 0L else r.getLong(3))
    }
    var prevSig = sig(e)
    var converged = false
    var iters = 0
    while (!converged && iters < maxIters) {
      val prev = e
      e = smallStar(largeStar(prev)).localCheckpoint(false)
      val s = sig(e) // materializes the lazy checkpoint
      prev.unpersist(false)
      converged = s == prevSig
      prevSig = s
      iters += 1
    }
    if (!converged) {
      e.unpersist(false)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge in $maxIters rounds; raise maxIters")
    }
    // star edges point node -> component min; roots label themselves
    e.select(col("src").as("node"), col("dst").as("label"))
      .unionByName(e.select(col("dst").as("node"), col("dst").as("label")))
      .distinct()
  }

  /** documents ∪ truncated copies of every 10th doc (ids shifted by 10^7).
    * Source ids are guarded below 1e7 inside the scan (see
    * CrossEngine.guardedId) — id collisions with the planted range would
    * otherwise produce silently-wrong pairs on BOTH engines. */
  private[graft] def withPlantedDups(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir).select(
      graft.functions.CrossEngine.guardedId(col("doc_id"), 10000000L, "withPlantedDups").as("doc_id"),
      col("text"))
    val planted = base
      .filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"), truncate90.as("text"))
    base.unionByName(planted)
  }

  // ---------------------------------------------------------------- exact
  /** Exact dedup on a content hash (SURVEY §2.13): keep lowest doc_id. */
  private val d01 = Q(
    "d01_exact_dedup",
    (s, dir) => {
      Tables.documents(s, dir)
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
    },
    Some("""SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
      count(*) AS n_copies FROM documents GROUP BY md5(text)"""))

  /** 3-word shingle sets. The token array is projected ONCE per row before
    * the transform: higher-order-function lambdas are evaluated interpreted
    * per element, so `split(text)` inside the lambda would re-tokenize the
    * whole document per shingle — O(len²)/doc (measured: ~2× on d06). */
  private[graft] def shingleSets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), array_distinct(expr(
        """transform(sequence(1, greatest(size(toks) - 2, 1)),
           i -> concat_ws(' ', slice(toks, i, 3)))""")).as("sh"))

  /** documents ∪ EXACT copies of every 10th doc (ids shifted by 10^7) — the
    * planted set for the production-hash recall invariants (d11/d12).
    * Identical text ⇒ identical signatures ⇒ the planted pair co-buckets in
    * EVERY band, so 100% recall is deterministic — which is what lets the
    * xxhash production paths sit under the driver's hash gate behind a
    * constant-true oracle (the truncated-copy variant above is
    * probabilistic: a 90%-token copy can miss all bands with ~1% odds). */
  private def withPlantedExactDups(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir).select(
      graft.functions.CrossEngine.guardedId(col("doc_id"), 10000000L, "withPlantedExactDups").as("doc_id"),
      col("text"))
    base.unionByName(
      base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text")))
  }

  /** The (doc_a, doc_b) pairs withPlanted*Dups planted, derived from the
    * same frame so the invariant queries can't drift from the planting. */
  private[graft] def plantedPairsOf(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") < 10000000L && col("doc_id") % 10 === 0)
      .select(col("doc_id").as("doc_a"), (col("doc_id") + 10000000L).as("doc_b"))

  // ---------------------------------------------------------------- minhash
  /** MinHash signatures (32 permutations over 3-word shingles) -> banded
    * LSH (8 bands x 4 rows) -> candidate pairs -> exact Jaccard verification
    * on the shingle sets. Hash family: xxhash64 with per-permutation salt
    * (deterministic). Shared by d02 (gated since r11 via contract+recall booleans; the hash family is
    * engine-specific) and d11 (planted-recall invariant under the gate).
    * `bucketCap` bounds hot-bucket width (see [[capHotBuckets]]); <= 0
    * disables. Library entry point, invoked repeatedly per session — the
    * result is materialized eagerly and the pipeline caches released
    * before returning (the packSequences contract; persist alone leaked
    * sets+sigs across calls). */
  def minhashPairs(docs: DataFrame, bucketCap: Int = 256): DataFrame = {
      val nPerm = 32
      val bands = 8
      val rowsPerBand = nPerm / bands

      // shingle SETS computed once and reused by both the signature stage
      // (explode -> grouped min) and the exact-Jaccard verification join
      val sets = shingleSets(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val shingles = sets.select(col("doc_id"), explode(col("sh")).as("shingle"))

      // signature: per-doc min of each salted hash (one grouped agg,
      // map-side combined)
      val sigCols = (0 until nPerm).map(i =>
        min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
      val sigs = shingles.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
        .withColumn("sig", array((0 until nPerm).map(i => col(s"h$i")): _*))
        .select(col("doc_id"), col("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

      // banding: bucket key = hash of the band's signature slice
      val (banded, releaseCap) = capHotBuckets(
        sigs.select(col("doc_id"), col("sig"),
          explode(array((0 until bands).map(b =>
            struct(lit(b).as("band"),
              xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bucket"))): _*)).as("bb"))
          .select(col("doc_id"), col("bb.band"), col("bb.bucket")),
        Seq("band", "bucket"), "doc_id", bucketCap, "minhashPairs")

      // candidate pairs deduped on BARE ids: the distinct shuffles 16-byte
      // keys, not 2x32-long signatures (a pair co-bucketed in up to `bands`
      // bands would otherwise drag its signatures through the shuffle that
      // many times); signatures re-attach via the persisted sigs table
      val a = banded.alias("a")
      val b = banded.alias("b")
      val candidates = a.join(b,
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
            && col("a.sub") === col("b.sub")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
        .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
        .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))

      // estimated Jaccard = matching signature fraction; verify exactly
      val est = candidates.withColumn("est_jaccard",
        round(expr(s"size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) / cast($nPerm as double)"), 4))

      val verified = est
        .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
        .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
        .withColumn("jaccard", round(
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            (size(col("sh_a")) + size(col("sh_b")) - size(array_intersect(col("sh_a"), col("sh_b")))), 4))
        .filter(col("jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("est_jaccard"), col("jaccard"))

      // eager materialization so the persisted intermediates can be
      // released NOW instead of leaking across repeated library calls
      // (ADVICE r4: d02 + d11 in one session doubled the leaked cache)
      val out = verified.localCheckpoint(eager = true)
      releaseCap()
      sets.unpersist(false)
      sigs.unpersist(false)
      out
  }

  /** d02 under the driver's hash gate (r11 no-oracle greening, VERDICT
    * r10 next-6): the raw xxhash64 MinHash+LSH pipeline still runs on the
    * near-planted corpus — its pair set stays the library return of
    * [[minhashPairs]] — and the GATE entry folds it into recomputed
    * booleans a constant-true oracle can pin: raw-lane contract (ordered
    * pairs, every emitted pair exact-verified at >= 0.5) plus NEAR-twin
    * recall of the truncate90 plants. Thresholds sit strictly inside
    * measured behavior under the fixed hash family (tools/
    * NoOracleRecallScratch, 2026-08-14: recall 50/50 @sf0.01, 499/500
    * @sf0.1; min found-twin jaccard 0.7778; min est 0.6563), so any
    * banding, signature, or verification regression flips a boolean. */
  private val d02 = Q(
    "d02_minhash_lsh",
    (s, dir) => {
      val docs = withPlantedDups(s, dir)
      val raw = minhashPairs(docs)
      val rawAgg = raw.agg(
        (count(lit(1)) > 0).as("raw_nonempty"),
        coalesce(min(col("jaccard")) >= 0.5, lit(true)).as("raw_all_verified"),
        (coalesce(max(when(col("doc_a") >= col("doc_b"), 1).otherwise(0)), lit(0)) === 0)
          .as("raw_pairs_ordered"))
      val rec = plantedPairsOf(docs).join(raw, Seq("doc_a", "doc_b"), "left")
        .agg(
          (count(lit(1)) > 0).as("planted_nonempty"),
          (count(col("jaccard")).cast("double") / count(lit(1)) >= 0.95)
            .as("near_recall_ge_095"),
          coalesce(min(col("jaccard")) >= 0.7, lit(false)).as("found_twins_verified"),
          coalesce(min(col("est_jaccard")) >= 0.5, lit(false)).as("est_tracks_jaccard"))
      rawAgg.crossJoin(rec)
    },
    Some("""SELECT true AS raw_nonempty, true AS raw_all_verified,
      true AS raw_pairs_ordered, true AS planted_nonempty,
      true AS near_recall_ge_095, true AS found_twins_verified,
      true AS est_tracks_jaccard"""))

  // ---------------------------------------------------------------- simhash
  /** 64-bit SimHash over unigram token hashes, entirely in codegen'd
    * higher-order functions; near-dup candidates via 16-bit band buckets and
    * Hamming distance (bit_count(xor)) <= 8. Shared by d03 (gated since r11 via contract+recall booleans:
    * hash-specific) and d12 (planted-recall invariant under the gate).
    * `bucketCap` bounds hot-bucket width ([[capHotBuckets]]); <= 0
    * disables. */
  def simhashPairs(docs: DataFrame, bucketCap: Int = 256): DataFrame = {
      val sims = docs
        .withColumn("hs", expr("transform(split(text, ' '), t -> xxhash64(t))"))
        .withColumn("simhash", graft.functions.VectorExpressions.simhash64(col("hs")))
        .select(col("doc_id"), col("simhash"))

      val (banded, releaseCap) = capHotBuckets(
        sims.select(col("doc_id"), col("simhash"),
          explode(array((0 until 4).map(b =>
            struct(lit(b).as("band"),
              expr(s"(simhash >> ${b * 16}) & 65535").as("bucket"))): _*)).as("bb"))
          .select(col("doc_id"), col("simhash"), col("bb.band"), col("bb.bucket")),
        Seq("band", "bucket"), "doc_id", bucketCap, "simhashPairs")

      val a = banded.alias("a")
      val b = banded.alias("b")
      val pairs = a.join(b,
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("a.sub") === col("b.sub")
          && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 8)
      if (bucketCap <= 0) pairs
      else {
        // cap path persisted the banded/counts frames; materialize the
        // (small) pair set and release them before returning
        val out = pairs.localCheckpoint(eager = true)
        releaseCap()
        out
      }
  }

  /** d03 under the gate (r11 no-oracle greening — see d02's preamble):
    * raw 64-bit SimHash lane folded to contract + near-twin-recall
    * booleans. SimHash is the coarser sketch (one 64-bit fingerprint, no
    * OR-redundant signature rows), so its measured near recall on the
    * truncate90 twins is genuinely lower — 40/50 @sf0.01, 376/500 @sf0.1
    * (NoOracleRecallScratch, fixed xxhash64 family) — and the pinned
    * threshold is >= 0.7, strictly inside both measurements. A banding or
    * bit_count regression drops recall to ~0 and flips the boolean. */
  private val d03 = Q(
    "d03_simhash",
    (s, dir) => {
      val docs = withPlantedDups(s, dir)
      val raw = simhashPairs(docs)
      val rawAgg = raw.agg(
        (count(lit(1)) > 0).as("raw_nonempty"),
        coalesce(max(col("hamming")) <= 8L, lit(true)).as("raw_within_radius"),
        (coalesce(max(when(col("doc_a") >= col("doc_b"), 1).otherwise(0)), lit(0)) === 0)
          .as("raw_pairs_ordered"))
      val rec = plantedPairsOf(docs).join(raw, Seq("doc_a", "doc_b"), "left")
        .agg(
          (count(lit(1)) > 0).as("planted_nonempty"),
          (count(col("hamming")).cast("double") / count(lit(1)) >= 0.7)
            .as("near_recall_ge_07"),
          coalesce(max(col("hamming")) <= 8L, lit(true)).as("found_twins_within_radius"))
      rawAgg.crossJoin(rec)
    },
    Some("""SELECT true AS raw_nonempty, true AS raw_within_radius,
      true AS raw_pairs_ordered, true AS planted_nonempty,
      true AS near_recall_ge_07, true AS found_twins_within_radius"""))

  // ---------------------------------------------------------------- jaccard
  /** Exact 3-gram Jaccard between adjacent doc pairs — deterministic and
    * ANSI-expressible, so it carries a DuckDB oracle (validates the shingle
    * + set-similarity machinery the LSH paths build on). */
  private val d04 = Q(
    "d04_ngram_jaccard",
    (s, dir) => {
      val sets = shingleSets(Tables.documents(s, dir))
      val a = sets.alias("a")
      val b = sets.alias("b")
      a.join(b, col("a.doc_id") + 1 === col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          round(size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
            (size(col("a.sh")) + size(col("b.sh")) - size(array_intersect(col("a.sh"), col("b.sh")))), 6)
            .as("jaccard"))
    },
    Some("""WITH sets AS (
        SELECT doc_id, list_distinct(list_transform(
          range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
          i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS sh
        FROM documents)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
      FROM sets a JOIN sets b ON a.doc_id + 1 = b.doc_id"""))

  // ---------------------------------------------------------------- embedding
  /** Embedding-cosine near-dup: plant exact copies of vec_id < 20 (ids
    * shifted by 10^6), bucket by random-hyperplane signs (same plan shape
    * as Similarity s02 — candidate generation is an equi-join on the bucket
    * key), exact cosine >= 0.99 confirms. Rows-only (bucketing is
    * engine-specific); planted-recall is asserted in OperatorsSpec. */
  /** The production embedding-near-dup pipeline (seeded Gaussian
    * hyperplanes — engine-specific, hence boolean-gated in d05 since r11); d13 runs the
    * same dataflow under the gate via a planted-recall invariant.
    * `bucketCap` bounds hot-bucket width ([[capHotBuckets]] — an embedding
    * corpus with thousands of near-identical vectors floods one sign
    * bucket the same way identical text floods a band bucket); <= 0
    * disables. */
  def embeddingNeardupPairs(vecs: DataFrame, bucketCap: Int = 256): DataFrame = {
      import graft.functions.VectorExpressions.cosineF
      val dim = 64
      val nPlanes = 8
      // TWO independent hyperplane tables (ADVICE r5): the banded MinHash/
      // SimHash paths keep OR-redundancy under the hot-bucket cap because
      // every band splits a hot bucket independently, so a pair separated
      // by one band's id-hash split still co-buckets in another band. A
      // single sign table has no second chance — a true pair inside an
      // over-cap bucket whose members hash to different sub-buckets was
      // permanently lost. The second table (independent seed, its own cap
      // split) restores that recovery channel; candidates are OR-unioned
      // and dedup'd after the exact-cosine verify, which both tables
      // compute identically.
      val releases = scala.collection.mutable.ArrayBuffer[() => Unit]()
      def tablePairs(seed: Long): DataFrame = {
        val rng = new scala.util.Random(seed)
        val planes = Array.fill(nPlanes)(Array.fill(dim)(rng.nextGaussian()))
        val (withBucket, releaseCap) = capHotBuckets(
          vecs.withColumn("bucket",
            graft.functions.VectorExpressions.hyperplaneBucket(col("embedding"), planes)),
          Seq("bucket"), "vec_id", bucketCap, s"embeddingNeardupPairs[seed=$seed]")
        releases += releaseCap
        val a = withBucket.alias("a")
        val b = withBucket.alias("b")
        a.join(b,
            col("a.bucket") === col("b.bucket") && col("a.sub") === col("b.sub")
            && col("a.vec_id") < col("b.vec_id"))
          .withColumn("cosine", cosineF(col("a.embedding"), col("b.embedding")))
          .filter(col("cosine") >= 0.99)
          .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
            round(col("cosine"), 6).as("cosine"))
      }
      val pairs = tablePairs(43L).unionByName(tablePairs(44L)).distinct()
      if (bucketCap <= 0) pairs
      else {
        val out = pairs.localCheckpoint(eager = true)
        releases.foreach(_())
        out
      }
  }

  /** embeddings ∪ exact copies of vec_id < 20 (ids shifted by 10^6). */
  private[graft] def withPlantedVecDups(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    base.unionByName(base.filter(col("vec_id") < 20)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
  }

  /** d05 under the gate (r11 no-oracle greening — see d02's preamble):
    * the seeded-Gaussian hyperplane lane folded to contract + planted
    * recall. The plants here are EXACT vector copies, so recall is
    * deterministic by construction (identical vector ⇒ identical sign
    * bucket in every table ⇒ candidate; cosine 1 passes the verify) —
    * the d13 invariant, now also greening the raw entry itself. */
  private val d05 = Q(
    "d05_embedding_neardup",
    (s, dir) => {
      val raw = embeddingNeardupPairs(withPlantedVecDups(s, dir))
      val rawAgg = raw.agg(
        (count(lit(1)) > 0).as("raw_nonempty"),
        coalesce(min(col("cosine")) >= 0.99, lit(true)).as("raw_all_verified"),
        (coalesce(max(when(col("vec_a") >= col("vec_b"), 1).otherwise(0)), lit(0)) === 0)
          .as("raw_pairs_ordered"))
      val expected = Tables.embeddings(s, dir)
        .filter(col("vec_id") < 20)
        .select(col("vec_id").as("vec_a"), (col("vec_id") + 1000000L).as("vec_b"))
      val rec = expected.join(raw, Seq("vec_a", "vec_b"), "left")
        .agg(
          (count(lit(1)) > 0).as("planted_nonempty"),
          (count(col("cosine")) === count(lit(1))).as("all_planted_found"),
          coalesce(min(col("cosine")) >= 0.999999, lit(false)).as("planted_cosine_one"))
      rawAgg.crossJoin(rec)
    },
    Some("""SELECT true AS raw_nonempty, true AS raw_all_verified,
      true AS raw_pairs_ordered, true AS planted_nonempty,
      true AS all_planted_found, true AS planted_cosine_one"""))

  // ------------------------------------------------------- oracle variants
  // The engine-native d02/d03/d05 use xxhash64 / seeded hyperplanes (fast,
  // engine-specific -> boolean-gated since r11). These variants re-express the SAME
  // pipelines with md5-derived hashes both engines implement identically,
  // so the full MinHash/SimHash/embedding near-dup dataflows run under the
  // DuckDB oracle end to end.

  /** md5-based 60-bit hash of (value + salt), identical in both engines
    * (shared contract: [[graft.functions.CrossEngine.md5Hash60]]). */
  private def md5Hash(c: Column, salt: Int): Column =
    graft.functions.CrossEngine.md5Hash60(c, Some(salt))

  private[graft] val sqlPlanted =
    """SELECT doc_id, text FROM documents
       UNION ALL
       SELECT doc_id + 10000000,
         array_to_string(string_split(text, ' ')[1:greatest(CAST(floor(len(string_split(text, ' ')) * 0.9) AS INT), 1)], ' ')
       FROM documents WHERE doc_id % 10 = 0"""

  // ---------------------------------------------------------------- d06
  /** MinHash + banded LSH + exact-Jaccard verify, oracle-checked end to end
    * (8 permutations, 4 bands x 2 rows).
    *
    * This is the VERIFICATION twin of d02 (which runs the full corpus with
    * xxhash64): it exercises every stage of the same dataflow under the
    * DuckDB gate, so it runs on a 1-in-5 corpus slice — planted originals
    * are doc_id % 10 == 0, so every planted pair survives the slice. */
  /** Shared Kirsch-Mitzenmacher MinHash machinery (Spark side), used by d06
    * (corpus self-join twin) and d10 (incremental new-vs-corpus): ONE md5
    * per shingle split into two 60-bit integer lanes (15 hex chars each —
    * BIGINT-safe), then the whole 8-permutation family is double hashing
    * (ha + i·hb) mod 2^32 — integer adds/mults in the min() aggregates
    * instead of a digest per permutation. ha + 7·hb <= 8·(2^60-1) < 2^63:
    * no overflow in either engine. The digest lanes are PROJECTED once per
    * shingle row: aggregate expressions get no common-subexpression
    * elimination, so md5 inside each min() would run nPerm times per row.
    * Band key = md5 of the band's two signature values. Returns banded
    * (doc_id, band, bucket) rows. */
  private[graft] def kmBands(sets: DataFrame): DataFrame = {
    val nPerm = 8 // fixed: kmSqlPrefix mirrors exactly this family
    val shingles = sets.select(col("doc_id"), explode(col("sh")).as("shingle"))
      .select(col("doc_id"), md5(col("shingle")).as("dig"))
      .select(col("doc_id"),
        conv(substring(col("dig"), 1, 15), 16, 10).cast("long").as("ha"),
        conv(substring(col("dig"), 17, 15), 16, 10).cast("long").as("hb"))
    val sigCols = (0 until nPerm).map { i =>
      min((col("ha") + lit(i.toLong) * col("hb")) % lit(4294967296L)).as(s"h$i")
    }
    val sigs = shingles.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    val bandCols = (0 until nPerm / 2).map(b =>
      struct(lit(b).as("band"),
        md5(concat_ws(",", col(s"h${2 * b}"), col(s"h${2 * b + 1}"))).as("bucket")))
    sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
  }

  /** Exact-Jaccard verification of candidate (doc_a, doc_b) pairs against
    * the shingle-set table; keeps pairs at or above `threshold`. */
  private[graft] def jaccardVerify(cand: DataFrame, sets: DataFrame,
      threshold: Double = 0.5): DataFrame =
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - size(array_intersect(col("sh_a"), col("sh_b")))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))

  /** DuckDB mirror of the shared KM pipeline: WITH-clause prefix defining
    * sets/shingles/sigs/banded over `docsSql`, plus the verification tail
    * fragments — both oracles compose from this single template so the two
    * engines' pipelines can't drift apart. */
  private[graft] def kmSqlPrefix(docsSql: String): String = {
    val hs = (0 until 8).map(i =>
      s"min((ha + $i * hb) % 4294967296) AS h$i")
      .mkString(",\n           ")
    val bands = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band, md5(CAST(h${2 * b} AS VARCHAR) || ',' || CAST(h${2 * b + 1} AS VARCHAR)) AS bucket FROM sigs")
      .mkString("\n         UNION ALL ")
    s"""WITH sets AS MATERIALIZED (
         SELECT doc_id, list_distinct(list_transform(
           range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
           i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS sh
         FROM ($docsSql) docs),
        shingles AS (SELECT doc_id,
           CAST(concat('0x', substring(md5(shingle), 1, 15)) AS BIGINT) AS ha,
           CAST(concat('0x', substring(md5(shingle), 17, 15)) AS BIGINT) AS hb
         FROM (SELECT doc_id, unnest(sh) AS shingle FROM sets) u),
        sigs AS MATERIALIZED (SELECT doc_id,
           $hs
         FROM shingles GROUP BY doc_id),
        banded AS MATERIALIZED ($bands)"""
  }

  private[graft] val kmSqlVerifyTail: String =
    """SELECT c.doc_a, c.doc_b,
        round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
          (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 6) AS jaccard
      FROM cand c JOIN sets sa ON sa.doc_id = c.doc_a JOIN sets sb ON sb.doc_id = c.doc_b
      WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
          (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= 0.5"""

  private val d06 = Q(
    "d06_minhash_oracle",
    (s, dir) => {
      val docs = withPlantedDups(s, dir).filter(col("doc_id") % 5 === 0)
      val sets = shingleSets(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val banded = kmBands(sets)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val a = banded.alias("a")
      val b = banded.alias("b")
      val cand = a.join(b, col("a.band") === col("b.band")
          && col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
      // materialize, then release the session-shared caches (the 111-query
      // Verify run otherwise carries every body's persists to the end)
      val out = jaccardVerify(cand, sets).localCheckpoint(true)
      sets.unpersist(false)
      banded.unpersist(false)
      out
    },
    Some {
      s"""${kmSqlPrefix(s"SELECT * FROM ($sqlPlanted) p WHERE doc_id % 5 = 0")},
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
      $kmSqlVerifyTail"""
    })

  // ---------------------------------------------------------------- d10
  /** INCREMENTAL near-dup — the operational mode a production dedup runs
    * daily: a NEW batch of documents is checked against the EXISTING
    * corpus without ever re-pairing the corpus with itself. Candidate
    * generation is the ASYMMETRIC band join (new signatures vs corpus
    * signatures); the corpus side's signatures are exactly what a real
    * deployment would have persisted from previous runs, so each
    * incremental run costs O(|new| + matched buckets), not O(|corpus|²).
    * Harness: the new batch is the planted truncations (ids + 1e7); the
    * corpus is the 1-in-5 base slice. */
  private val d10 = Q(
    "d10_incremental_neardup",
    (s, dir) => {
      // EXACTLY d06's dataset (one source of truth for the planting
      // scheme): base 1-in-5 slice = corpus, planted truncations (+1e7) =
      // the new batch. The id-space split the asymmetric join relies on is
      // guarded lazily inside withPlantedDups' scan (guardedId) — a corpus
      // whose ids reached 1e7 would otherwise silently classify real docs
      // as "new" and collide with planted ids.
      val docs = withPlantedDups(s, dir).filter(col("doc_id") % 5 === 0)
      val sets = shingleSets(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val banded = kmBands(sets)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val corpusSide = banded.filter(col("doc_id") < 10000000L).alias("a")
      val newSide = banded.filter(col("doc_id") >= 10000000L).alias("b")
      val cand = corpusSide.join(newSide,
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
      val out = jaccardVerify(cand, sets).localCheckpoint(true)
      sets.unpersist(false)
      banded.unpersist(false)
      out
    },
    Some {
      s"""${kmSqlPrefix(s"SELECT * FROM ($sqlPlanted) p WHERE doc_id % 5 = 0")},
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.bucket = b.bucket
          WHERE a.doc_id < 10000000 AND b.doc_id >= 10000000)
      $kmSqlVerifyTail"""
    })

  // ---------------------------------------------------------------- d07
  /** 16-bit SimHash signatures over md5 token hashes — oracle-checked
    * (majority vote per bit as conditional sums; the banding/pairing on top
    * is d03's machinery). */
  private val d07 = Q(
    "d07_simhash_oracle",
    (s, dir) => {
      val docs = withPlantedDups(s, dir)
      val toks2 = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .withColumn("h", md5Hash(col("token"), 0))
      val bitCols = (0 until 16).map(b =>
        sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$b"))
      toks2.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
        .select(col("doc_id"),
          (0 until 16).map(b => when(col(s"v$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
            .reduce(_ + _).as("simhash16"))
    },
    Some {
      val vs = (0 until 16).map(b =>
        s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v$b")
        .mkString(",\n           ")
      val bits = (0 until 16).map(b =>
        s"CASE WHEN v$b >= 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
      s"""WITH toks AS (
          SELECT doc_id, CAST(concat('0x', substring(md5(token || '#0'), 1, 15)) AS BIGINT) AS h
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM ($sqlPlanted) docs) t),
        votes AS (SELECT doc_id,
           $vs
         FROM toks GROUP BY doc_id)
      SELECT doc_id, CAST($bits AS BIGINT) AS simhash16 FROM votes"""
    })

  // ---------------------------------------------------------------- d08
  /** Embedding-cosine near-dup, brute-force oracle variant: planted exact
    * copies must pair with their originals at cosine >= 0.99. */
  private val d08 = Q(
    "d08_embedding_neardup_oracle",
    (s, dir) => {
      import graft.functions.VectorExpressions.cosineF
      val base = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val planted = base.filter(col("vec_id") < 20)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      val all0 = base.unionByName(planted)
      val q = planted.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
      all0.crossJoin(broadcast(q))
        .filter(col("vec_id") < col("vec_b"))
        .withColumn("cosine", cosineF(col("embedding"), col("emb_b")))
        .filter(col("cosine") >= 0.99)
        .select(col("vec_id").as("vec_a"), col("vec_b"), round(col("cosine"), 6).as("cosine"))
    },
    Some("""WITH all0 AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id < 20),
      q AS (SELECT vec_id AS vec_b, embedding AS emb_b FROM all0 WHERE vec_id >= 1000000),
      pairs AS (
        SELECT a.vec_id AS vec_a, q.vec_b,
          list_sum(list_transform(range(1, len(a.embedding) + 1),
            i -> CAST(a.embedding[i] AS DOUBLE) * CAST(q.emb_b[i] AS DOUBLE))) /
          (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
           sqrt(list_sum(list_transform(q.emb_b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
          AS cosine
        FROM all0 a CROSS JOIN q WHERE a.vec_id < q.vec_b)
      SELECT vec_a, vec_b, round(cosine, 6) AS cosine FROM pairs WHERE cosine >= 0.99"""))

  // ---------------------------------------------------------------- d09
  /** Duplicate CLUSTERING — the production stage after pair generation:
    * near-dup pairs are edges, connected components group them into
    * clusters, and the canonical survivor per cluster is the min doc_id.
    * Without this stage a pipeline that drops "the second doc of every
    * pair" over-deletes on transitive chains (A~B, B~C but A!~C must keep
    * exactly one of {A,B,C}, not zero).
    *
    * Harness: plants a 2-generation truncation chain per base doc
    * (g1 = 80% prefix, g2 = 60% prefix of g1 ~= 48% of base) so the edge
    * set is a genuine PATH — J(base,g1)~0.8 and J(g1,g2)~0.6 pass the 0.5
    * threshold, J(base,g2)~0.48 does not — and only transitive closure
    * finds the 3-member cluster. Candidate pairs come from id arithmetic
    * (validation-harness form, d04 precedent); the production candidate
    * source is d02/d03's banded LSH.
    *
    * CC algorithm: hash-to-min label propagation —
    * label(v) <- min(label(v), min over neighbors) iterated to fixpoint.
    * Converges in O(diameter) rounds; near-dup clusters have tiny diameter
    * (chains of re-posts), so 2-4 rounds in practice. Each round is one
    * shuffle join on node ids + a map-side-combined min agg; labels are
    * re-persisted and lineage-truncated per round so the plan stays flat.
    * For adversarially deep graphs the documented upgrade is
    * large-star/small-star (Kiveris et al., "Connected Components in
    * MapReduce"), same join/agg primitives, O(log n) rounds. */
  private val d09 = Q(
    "d09_dup_clusters",
    (s, dir) => {
      val base = Tables.documents(s, dir).select(
          graft.functions.CrossEngine.guardedId(col("doc_id"), 10000000L, "d09").as("doc_id"),
          col("text"))
        .filter(col("doc_id") % 10 === 0)
      // generation lengths computed from the BASE token count so Spark and
      // DuckDB truncate identically (int cast = floor for positive values)
      val g1 = base.select((col("doc_id") + 10000000L).as("doc_id"),
        array_join(slice(toks, lit(1),
          greatest((size(toks) * 0.8).cast("int"), lit(1))), " ").as("text"))
      val g2 = base.select((col("doc_id") + 20000000L).as("doc_id"),
        array_join(slice(toks, lit(1),
          greatest((greatest((size(toks) * 0.8).cast("int"), lit(1)) * 0.6).cast("int"),
            lit(1))), " ").as("text"))
      val docs = base.unionByName(g1).unionByName(g2)

      val sets = shingleSets(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

      // candidate pairs: same base group (id mod 1e7), ordered
      val a = sets.select(col("doc_id").as("src"), col("sh").as("sh_a"))
      val b = sets.select(col("doc_id").as("dst"), col("sh").as("sh_b"))
      val edges = a.join(b,
          col("src") % 10000000L === col("dst") % 10000000L && col("src") < col("dst"))
        .withColumn("jaccard",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            (size(col("sh_a")) + size(col("sh_b")) - size(array_intersect(col("sh_a"), col("sh_b")))))
        .filter(col("jaccard") >= 0.5)
        .select(col("src"), col("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

      val labels = connectedComponents(edges)
      // labels are eagerly checkpointed inside connectedComponents, so the
      // upstream caches can be released before the (labels-only) projection
      edges.unpersist(false)
      sets.unpersist(false)
      val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
      // materialize the final projection and release the labels checkpoint
      // too — otherwise it sits in executor storage for the rest of the
      // session (the same leak class as the sets/banded persists)
      val out = labels.join(sizes, Seq("label"))
        .select(col("node").as("doc_id"), col("label").as("cluster_id"),
          col("cluster_size"), (col("node") === col("label")).as("is_canonical"))
        .localCheckpoint(true)
      labels.unpersist(false)
      out
    },
    Some("""WITH RECURSIVE base AS (
        SELECT doc_id, string_split(text, ' ') AS tk FROM documents WHERE doc_id % 10 = 0),
      docs AS (
        SELECT doc_id, array_to_string(tk, ' ') AS text FROM base
        UNION ALL
        SELECT doc_id + 10000000,
          array_to_string(tk[1:greatest(CAST(floor(len(tk) * 0.8) AS INT), 1)], ' ') FROM base
        UNION ALL
        SELECT doc_id + 20000000,
          array_to_string(tk[1:greatest(CAST(floor(greatest(CAST(floor(len(tk) * 0.8) AS INT), 1) * 0.6) AS INT), 1)], ' ')
        FROM base),
      sets AS (
        SELECT doc_id, list_distinct(list_transform(
          range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
          i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS sh
        FROM docs),
      edges AS (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM sets a JOIN sets b
          ON a.doc_id % 10000000 = b.doc_id % 10000000 AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
      und AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
      reach(a, b) AS (
        SELECT src, dst FROM und
        UNION
        SELECT r.a, u.dst FROM reach r JOIN und u ON r.b = u.src),
      labels AS (
        SELECT a AS node, least(a, min(b)) AS cluster_id FROM reach GROUP BY a),
      sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM labels GROUP BY cluster_id)
      SELECT l.node AS doc_id, l.cluster_id, s.cluster_size,
        l.node = l.cluster_id AS is_canonical
      FROM labels l JOIN sizes s ON l.cluster_id = s.cluster_id"""))

  // -------------------------------------- production-hash gate invariants
  // d02/d03/d05 run hash families the oracle can't reproduce (xxhash64 /
  // seeded Gaussians) — since r11 they fold to contract+recall booleans
  // under constant-true oracles — and their md5 oracle twins (d06/d07/d08)
  // run a DIFFERENT hash family. These entries put the production hash paths
  // themselves under the driver's hash gate: plant EXACT duplicates (whose
  // recall is deterministic — identical text ⇒ identical signature ⇒
  // co-bucketed in every band), reduce to scale-invariant booleans, and pin
  // them against a constant-true oracle. Any recall loss, banding bug, or
  // verification drift flips a boolean and the driver goes red.

  private val d11 = Q(
    "d11_minhash_planted_recall",
    (s, dir) => {
      val docs = withPlantedExactDups(s, dir)
      plantedPairsOf(docs)
        .join(minhashPairs(docs), Seq("doc_a", "doc_b"), "left")
        .agg(
          (count(lit(1)) > 0).as("nonempty"),
          (count(col("jaccard")) === count(lit(1))).as("all_planted_found"),
          (min(col("est_jaccard")) === 1.0).as("planted_sigs_identical"),
          (min(col("jaccard")) === 1.0).as("planted_jaccard_one"))
    },
    Some("""SELECT true AS nonempty, true AS all_planted_found,
      true AS planted_sigs_identical, true AS planted_jaccard_one"""))

  private val d12 = Q(
    "d12_simhash_planted_recall",
    (s, dir) => {
      val docs = withPlantedExactDups(s, dir)
      plantedPairsOf(docs)
        .join(simhashPairs(docs), Seq("doc_a", "doc_b"), "left")
        .agg(
          (count(lit(1)) > 0).as("nonempty"),
          (count(col("hamming")) === count(lit(1))).as("all_planted_found"),
          (max(col("hamming")) === 0L).as("planted_hamming_zero"))
    },
    Some("""SELECT true AS nonempty, true AS all_planted_found,
      true AS planted_hamming_zero"""))

  private val d13 = Q(
    "d13_embedding_planted_recall",
    (s, dir) => {
      val base = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val expected = base.filter(col("vec_id") < 20)
        .select(col("vec_id").as("vec_a"), (col("vec_id") + 1000000L).as("vec_b"))
      // nonempty (not a hardcoded 20): the expected count derives from the
      // same frame the planting derives from, so a re-keyed or smaller
      // embeddings table can't flip the gate without an actual engine bug
      // (ADVICE r4 — the d11 plantedPairsOf pattern)
      expected
        .join(embeddingNeardupPairs(withPlantedVecDups(s, dir)),
          Seq("vec_a", "vec_b"), "left")
        .agg(
          (count(lit(1)) > 0).as("nonempty"),
          (count(col("cosine")) === count(lit(1))).as("all_planted_found"),
          (min(col("cosine")) >= 0.999999).as("planted_cosine_one"))
    },
    Some("""SELECT true AS nonempty, true AS all_planted_found,
      true AS planted_cosine_one"""))

  // ---------------------------------------------------------------- d14
  /** SEMANTIC dedup end-to-end (VERDICT r5 missing #3 — the SemDeDup-style
    * pipeline a training-data curator runs): embedding near-dup PAIRS →
    * connected components → cluster sizes + canonical keep, i.e. d08's
    * pair lane composed with d09's clustering stage, on the EMBEDDING
    * table instead of text. Two planted copy generations per vec_id < 10
    * (+1e6, +2e6) make each cluster a genuine 3-node component the closure
    * must assemble; the canonical survivor is the min id — always the
    * ORIGINAL, since planted ids are offset — which is exactly the "keep
    * one representative per semantic cluster" curation rule. Candidate
    * generation here is the oracle-expressible brute-force lane (d08
    * precedent); the production candidate source at 100 TB is d05's
    * hyperplane-bucketed LSH, and the CC + canonical stages are shared. */
  private val d14 = Q(
    "d14_semantic_dedup",
    (s, dir) => {
      import graft.functions.VectorExpressions.cosineF
      // ids >= 1e6 would collide with the planted generations and silently
      // break the min-id-is-original canonical rule — fail loudly instead
      // (ADVICE r6; the withPlantedDups/guardedId precedent)
      val base = Tables.embeddings(s, dir).select(
        graft.functions.CrossEngine.guardedId(col("vec_id"), 1000000L, "d14").as("vec_id"),
        col("embedding"))
      def gen(offset: Long) = base.filter(col("vec_id") < 10)
        .select((col("vec_id") + offset).as("vec_id"), col("embedding"))
      val all0 = base.unionByName(gen(1000000L)).unionByName(gen(2000000L))
      val q = gen(1000000L).unionByName(gen(2000000L))
        .select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
      val edges = all0.crossJoin(broadcast(q))
        .filter(col("vec_id") < col("vec_b"))
        .withColumn("cosine", cosineF(col("embedding"), col("emb_b")))
        .filter(col("cosine") >= 0.99)
        .select(col("vec_id").as("src"), col("vec_b").as("dst"))
      val labels = connectedComponents(edges)
      val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
      val out = labels.join(sizes, Seq("label"))
        .select(col("node").as("vec_id"), col("label").as("cluster_id"),
          col("cluster_size"), (col("node") === col("label")).as("is_canonical"))
        .localCheckpoint(true)
      labels.unpersist(false)
      out
    },
    Some("""WITH RECURSIVE all0 AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id < 10
        UNION ALL
        SELECT vec_id + 2000000, embedding FROM embeddings WHERE vec_id < 10),
      q AS (SELECT vec_id AS vec_b, embedding AS emb_b FROM all0 WHERE vec_id >= 1000000),
      edges AS (
        SELECT a.vec_id AS src, q.vec_b AS dst
        FROM all0 a CROSS JOIN q
        WHERE a.vec_id < q.vec_b AND
          list_sum(list_transform(range(1, len(a.embedding) + 1),
            i -> CAST(a.embedding[i] AS DOUBLE) * CAST(q.emb_b[i] AS DOUBLE))) /
          (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
           sqrt(list_sum(list_transform(q.emb_b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
          >= 0.99),
      und AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
      reach(a, b) AS (
        SELECT src, dst FROM und
        UNION
        SELECT r.a, u.dst FROM reach r JOIN und u ON r.b = u.src),
      labels AS (
        SELECT a AS node, least(a, min(b)) AS cluster_id FROM reach GROUP BY a),
      sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM labels GROUP BY cluster_id)
      SELECT l.node AS vec_id, l.cluster_id, s.cluster_size,
        l.node = l.cluster_id AS is_canonical
      FROM labels l JOIN sizes s ON l.cluster_id = s.cluster_id"""))

  // ---------------------------------------------------------------- d15
  /** CHUNK-LEVEL near-dup (VERDICT r6 stretch #8 — the RefinedWeb/CCNet
    * curation step): find duplicated PASSAGES between documents by
    * composing t11's token-window chunker (size 64, stride 48) with the
    * shared KM MinHash lane (d06's [[kmBands]] + [[jaccardVerify]], both
    * unchanged). Each chunk becomes a mini-document keyed
    * `doc_id * 1e6 + chunk_no` (headroom to 48M-token documents before the
    * packing could collide — and doc ids are already guarded < 1e7 by
    * withPlantedDups); pairs whose chunks come from the SAME source doc
    * are excluded structurally — the chunker's 16-token overlap is a
    * property of chunking, not duplication (it also sits at J ≈ 0.14,
    * far under the 0.5 threshold, so the exclusion is belt and braces).
    * The planted 90%-prefix copies match chunk-for-chunk (early chunks are
    * token-identical, J = 1), which is exactly the passage-level signal a
    * paragraph dedup exists to find. Scale shape is d06's: banded
    * equi-join only — chunking multiplies rows by ~ceil(n/stride) but
    * NEVER by pairs. This is the GATE lane (km oracle hash family,
    * uncapped); the production 100 TB path is [[chunkMinhashPairs]] —
    * the same chunker riding the capped xxhash generator — and the spec
    * ties its pair set to this lane's results (the d14 precedent). */
  /** t11's token-window chunker as a doc->mini-doc frame: each size-64 /
    * stride-48 chunk keyed `doc_id * 1e6 + chunk_no` (headroom to
    * 48M-token documents; doc ids guarded < 1e7 upstream). ONE definition
    * shared by the d15 gate lane and the production lane
    * [[chunkMinhashPairs]] so the two cannot drift. */
  private[graft] def chunkDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), toks.as("tk"))
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, cast(greatest(ceil((size(tk) - 64) / 48.0), 0) as int)), " +
        "i -> concat_ws(' ', slice(tk, i * 48 + 1, 64)))")))
      .select((col("doc_id") * 1000000L + col("pos")).as("doc_id"),
        col("col").as("text"))

  /** PRODUCTION chunk-level near-dup (VERDICT r7 missing #2): the chunker
    * composed with the CAPPED production generator [[minhashPairs]]
    * (32-permutation xxhash signatures + [[capHotBuckets]]) — the lane a
    * 100 TB passage dedup actually rides, while d15 pins the identical
    * dataflow under the DuckDB gate via the km oracle hash family.
    * Same-source pairs are excluded structurally (the chunker's 16-token
    * overlap is a property of chunking, not duplication; it also sits at
    * J ≈ 0.14, far under minhashPairs' 0.5 threshold, so the exclusion
    * is belt and braces — applied after the verify, whose cost for
    * same-source candidates is negligible because overlap chunks almost
    * never co-bucket at J ≈ 0.14). Scale shape: chunking multiplies rows
    * by ~ceil(n/stride), never pairs; candidates stay a capped band
    * equi-join. */
  def chunkMinhashPairs(docs: DataFrame, bucketCap: Int = 256): DataFrame =
    minhashPairs(chunkDocs(docs), bucketCap)
      .filter(expr("doc_a DIV 1000000") =!= expr("doc_b DIV 1000000"))
      .select(col("doc_a"), col("doc_b"),
        expr("doc_a DIV 1000000").as("src_a"), expr("doc_b DIV 1000000").as("src_b"),
        col("est_jaccard"), col("jaccard"))

  private val d15 = Q(
    "d15_chunk_neardup",
    (s, dir) => {
      val docs = withPlantedDups(s, dir).filter(col("doc_id") % 5 === 0)
      val chunks = chunkDocs(docs)
      val sets = shingleSets(chunks)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val banded = kmBands(sets)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val a = banded.alias("a")
      val b = banded.alias("b")
      val cand = a.join(b, col("a.band") === col("b.band")
          && col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
        .filter(expr("a.doc_id DIV 1000000") =!= expr("b.doc_id DIV 1000000"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
      val out = jaccardVerify(cand, sets)
        .select(col("doc_a"), col("doc_b"),
          expr("doc_a DIV 1000000").as("src_a"), expr("doc_b DIV 1000000").as("src_b"),
          col("jaccard"))
        .localCheckpoint(true)
      sets.unpersist(false)
      banded.unpersist(false)
      out
    },
    Some {
      val chunksSql =
        s"""SELECT doc_id * 1000000 + chunk_no AS doc_id,
            array_to_string(tk[chunk_no * 48 + 1 : chunk_no * 48 + 64], ' ') AS text
          FROM (
            SELECT doc_id, tk,
              unnest(range(0, CAST(greatest(ceil((len(tk) - 64) / 48.0), 0) AS BIGINT) + 1)) AS chunk_no
            FROM (SELECT doc_id, string_split(text, ' ') AS tk
                  FROM ($sqlPlanted) p WHERE doc_id % 5 = 0) t) c"""
      s"""${kmSqlPrefix(chunksSql)},
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
          WHERE a.doc_id // 1000000 <> b.doc_id // 1000000),
        verified AS ($kmSqlVerifyTail)
      SELECT doc_a, doc_b, doc_a // 1000000 AS src_a, doc_b // 1000000 AS src_b,
        jaccard
      FROM verified"""
    })

  /** TRAIN/TEST DECONTAMINATION (GPT-3 Appendix C / Dolma-style, public):
    * flag evaluation documents that share any word 8-gram with the
    * training corpus — the benchmark-leakage check every LLM training run
    * performs before holding out an eval set. Planted eval frame: for
    * every 97th corpus doc, a CONTAMINATED test doc (a 20-word passage
    * lifted verbatim, so its 8-grams exist in train by construction) and
    * a CLEAN twin (the same passage with every word suffixed 'zz' —
    * suffixed words are outside the corpus vocabulary, so no n-gram can
    * match; spec-asserted). Scale shape: the eval side is benchmark-sized
    * (MBs against a 100 TB corpus) and is BROADCAST, so the train corpus
    * explodes its n-grams map-side and the overlap join is shuffle-free
    * on the corpus axis; only the post-join hit set (bounded by eval
    * n-gram count × collisions) reaches the grouped count. */
  /** The src/eval/evalg/traing CTEs shared by the d16 and st11 oracles —
    * the SQL mirror of [[evalFrame]] plus both sides' 8-gram tables. */
  private[graft] val decontamSqlPrefix: String =
    """src AS (
        SELECT doc_id, (string_split(text, ' '))[3:22] AS ptk
        FROM documents WHERE doc_id % 97 = 0),
      eval AS (
        SELECT doc_id + 50000000 AS test_id, array_to_string(ptk, ' ') AS text FROM src
        UNION ALL
        SELECT doc_id + 60000000,
          array_to_string(list_transform(ptk, w -> w || 'zz'), ' ') FROM src),
      evalg AS (
        SELECT DISTINCT test_id, array_to_string(tk[i : i + 7], ' ') AS g FROM (
          SELECT test_id, tk,
            unnest(range(1, CAST(greatest(len(tk) - 7, 0) AS BIGINT) + 1)) AS i
          FROM (SELECT test_id, string_split(text, ' ') AS tk FROM eval) t) u),
      traing AS (
        SELECT doc_id, array_to_string(tk[i : i + 7], ' ') AS g FROM (
          SELECT doc_id, tk,
            unnest(range(1, CAST(greatest(len(tk) - 7, 0) AS BIGINT) + 1)) AS i
          FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) t) u)"""

  /** The d16 overlap core, reusable by the gate entry and the scale
    * rehearsal: per eval doc, the count of distinct shared word n-grams
    * and of distinct train docs sharing one. The eval side is broadcast;
    * train n-grams explode map-side and never shuffle. */
  /** All word n-grams of the token-array column `tk`. Total over any input
    * length (ADVICE r7): `sequence(1, 0)` runs DESCENDING in Spark, so the
    * unguarded form threw on docs shorter than n tokens; the sequence upper
    * bound is clamped to 1 (always ascending) and the explicit
    * `size(tk) >= n` predicate drops the one spurious short gram — the
    * same guard shingleSets and bpeLearnMerges carry. */
  private[graft] def wordNgrams(n: Int): Column = expr(
    s"filter(transform(sequence(1, greatest(size(tk) - ${n - 1}, 1)), " +
      s"i -> concat_ws(' ', slice(tk, i, $n))), g -> size(tk) >= $n)")

  /** The planted eval frame shared by d16 and st11: for every 97th corpus
    * doc, a CONTAMINATED test doc (a verbatim 20-word passage) and a CLEAN
    * twin (the same passage with every word suffixed out of the corpus
    * vocabulary). */
  private[graft] def evalFrame(docs: DataFrame): DataFrame = {
    val src = docs.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id"), slice(toks, 3, 20).as("ptk"))
    src.select((col("doc_id") + 50000000L).as("test_id"),
        concat_ws(" ", col("ptk")).as("text"))
      .unionByName(src.select((col("doc_id") + 60000000L).as("test_id"),
        concat_ws(" ", transform(col("ptk"), w => concat(w, lit("zz")))).as("text")))
  }

  private[graft] def decontaminate(train: DataFrame, evalDocs: DataFrame,
      n: Int): DataFrame = {
    def ngrams = wordNgrams(n)
    val evalGrams = evalDocs.select(col("test_id"), split(col("text"), " ").as("tk"))
      .select(col("test_id"), explode(ngrams).as("g")).distinct()
    val trainGrams = train.select(col("doc_id"), toks.as("tk"))
      .select(col("doc_id"), explode(ngrams).as("g"))
    val hits = trainGrams.join(broadcast(evalGrams), Seq("g"))
      .groupBy(col("test_id"))
      .agg(countDistinct(col("g")).as("hit_grams"),
        countDistinct(col("doc_id")).as("hit_train_docs"))
    evalDocs.select(col("test_id")).join(hits, Seq("test_id"), "left")
      .select(col("test_id"),
        coalesce(col("hit_grams"), lit(0L)).as("n_overlap_grams"),
        coalesce(col("hit_train_docs"), lit(0L)).as("n_train_docs"),
        (coalesce(col("hit_grams"), lit(0L)) > 0L).as("contaminated"))
  }

  private val d16 = Q(
    "d16_decontaminate",
    (s, dir) => {
      val docs = Tables.documents(s, dir).select(
        graft.functions.CrossEngine.guardedId(col("doc_id"), 50000000L, "d16").as("doc_id"),
        col("text"))
      decontaminate(docs, evalFrame(docs), n = 8)
    },
    Some(s"""WITH $decontamSqlPrefix,
      hits AS (
        SELECT e.test_id,
          count(DISTINCT e.g) AS hit_grams,
          count(DISTINCT t.doc_id) AS hit_train_docs
        FROM evalg e JOIN traing t ON e.g = t.g GROUP BY e.test_id)
      SELECT ev.test_id,
        CAST(coalesce(h.hit_grams, 0) AS BIGINT) AS n_overlap_grams,
        CAST(coalesce(h.hit_train_docs, 0) AS BIGINT) AS n_train_docs,
        coalesce(h.hit_grams, 0) > 0 AS contaminated
      FROM eval ev LEFT JOIN hits h ON ev.test_id = h.test_id"""))

  /** WINNOWING FINGERPRINTS (Schleimer/Wilkerson/Aiken '03 §4, the MOSS
    * algorithm; public) — EXACT-substring overlap detection, the lane the
    * MinHash family (set similarity) does not cover: hash every word
    * k-gram, slide a window of w consecutive k-gram hashes, keep each
    * window's MINIMUM — the selected set is ~2/(w+1) of all grams, and
    * the guarantee holds that any shared run of >= w+k-1 tokens shares at
    * least one fingerprint. Docs are then paired by fingerprint equi-join
    * (the d02 candidate shape — never all-pairs), so corpus-scale cost is
    * the sparsified fingerprint table, not the stride-1 gram table.
    * Hashes are md5-derived (the oracle lane) so the full selection +
    * pairing dataflow runs under the DuckDB hash gate. Planted: for every
    * 89th doc of >= 15 tokens a splice twin (+7e7) carrying a verbatim
    * run of >= 11 tokens (>= w+k-1, so a shared fingerprint is
    * GUARANTEED, not probabilistic) padded with out-of-vocabulary filler.
    * k=4, w=8. Hot fingerprints are bounded by [[winnowingPairs]]'s MOSS
    * document-frequency ceiling (inactive at gate scale — max df is 6 at
    * sf0.1 — so the oracle sees the uncapped result). */

  /** Winnowing fingerprint table (`doc_id`, `fp`): hash every word
    * k-gram (md5-derived 60-bit — the engine-shared oracle lane), slide a
    * window of w consecutive gram hashes, keep each window's MINIMUM —
    * ~2/(w+1) of all grams, with the Schleimer '03 §4 guarantee that any
    * shared token run >= w+k-1 shares at least one selected fingerprint.
    * Total over any doc length: docs shorter than k tokens yield no grams
    * (the wordNgrams guard), docs shorter than w+k-1 yield exactly one
    * window over what grams exist. */
  private[graft] def winnowFingerprints(docs: DataFrame, k: Int, w: Int): DataFrame =
    // one row-local codegen'd kernel per doc (VERDICT r17 #3): the gram
    // hashing, sliding-window minima, and per-doc distinct all happen
    // inside [[graft.functions.WinnowFingerprintSet]], so the only table
    // that ever materializes or shuffles is the sparse (~2/(w+1) density)
    // fingerprint table itself — the old stride-1 gram-string explode +
    // per-doc window sort + distinct shuffle was the bench's
    // contention-pathology site (5.2 s quiet → 206 s at load 3.2).
    // Equivalence with the declarative form is spec-pinned
    // (OperatorsSpec "d17 kernel").
    docs.select(col("doc_id"),
      explode(graft.functions.Winnow.fingerprintSet(toks, k, w)).as("fp"))

  /** Fingerprint-sharing pairs (`doc_a`, `doc_b`, `n_shared_fp`) with the
    * MOSS boilerplate ceiling (VERDICT r7 #1): fingerprints whose DOCUMENT
    * FREQUENCY exceeds `maxDocFreq` are dropped — counted and logged,
    * never silent — before the self-join. Winnowing fingerprints exact
    * substrings, so corpus-scale boilerplate (license blocks, repeated
    * disclaimers) concentrates millions of docs on single fingerprints;
    * an uncapped equi-join emits w²/2 pairs from one such key. Schleimer
    * '03's own MOSS deployment drops over-frequent fingerprints as
    * boilerplate for exactly this reason — unlike the banded MinHash
    * lanes there is no second band to recover a split pair, and a
    * substring shared by thousands of documents is by definition not
    * evidence of pairwise duplication, so dropping (not sub-bucketing)
    * is the semantically right bound here. `maxDocFreq <= 0` disables
    * (spec/rehearsal use only). */
  def winnowingPairs(docs: DataFrame, k: Int = 4, w: Int = 8,
      maxDocFreq: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fp0 = winnowFingerprints(docs, k, w)
    val (fp, release): (DataFrame, () => Unit) =
      if (maxDocFreq <= 0) (fp0, () => ())
      else {
        // df via an unordered count window (the capHotBuckets shape): one
        // hash exchange on fp that KEEPS the rows; persisted so the stats
        // job feeding the log line materializes exactly what the pair
        // join reads back
        val withDf = fp0.withColumn("df",
            count(lit(1)).over(Window.partitionBy(col("fp"))))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val hot = withDf.filter(col("df") > maxDocFreq)
          .agg(countDistinct(col("fp")).as("n_hot"), max(col("df")).as("widest")).head()
        if (hot.getLong(0) > 0) {
          log.warn(s"winnowingPairs: dropping ${hot.getLong(0)} boilerplate " +
            s"fingerprint(s) with document frequency > $maxDocFreq " +
            s"(widest ${hot.getLong(1)}) — the MOSS over-frequency rule")
        }
        (withDf.filter(col("df") <= maxDocFreq).select(col("doc_id"), col("fp")),
          () => { withDf.unpersist(false); () })
      }
    val a = fp.alias("a")
    val b = fp.alias("b")
    val pairs = a.join(b, col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_fp"))
    if (maxDocFreq <= 0) pairs
    else {
      val out = pairs.localCheckpoint(eager = true)
      release()
      out
    }
  }

  private val d17 = Q(
    "d17_winnowing",
    (s, dir) => {
      val base = Tables.documents(s, dir).select(
        graft.functions.CrossEngine.guardedId(col("doc_id"), 70000000L, "d17").as("doc_id"),
        col("text"))
      // splice only docs long enough that slice(toks, 5, 30) yields a
      // verbatim run >= w+k-1 = 11 tokens (needs >= 15 tokens; ADVICE r7:
      // shorter docs' twins carry no guaranteed shared fingerprint and the
      // spec's every-pair assertion held only by hash coincidence)
      val spliced = base.filter(col("doc_id") % 89 === 0 && size(toks) >= 15)
        .select((col("doc_id") + 70000000L).as("doc_id"),
          concat_ws(" ",
            concat_ws(" ", slice(toks, 5, 30)),
            concat_ws(" ", transform(slice(toks, 1, 4), t => concat(t, lit("zz")))))
            .as("text"))
      winnowingPairs(base.unionByName(spliced), k = 4, w = 8)
    },
    Some("""WITH spliced AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 70000000,
          array_to_string(tk[5:34], ' ') || ' ' ||
            array_to_string(list_transform(tk[1:4], t -> t || 'zz'), ' ')
        FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) t
        WHERE doc_id % 89 = 0 AND len(tk) >= 15),
      grams AS (
        SELECT doc_id, len(tk) - 3 AS n_grams, i - 1 AS pos,
          CAST(concat('0x',
            substring(md5(array_to_string(tk[i : i + 3], ' ')), 1, 15)) AS BIGINT) AS h
        FROM (
          SELECT doc_id, tk,
            unnest(range(1, CAST(greatest(len(tk) - 3, 0) AS BIGINT) + 1)) AS i
          FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM spliced) t) u),
      fp AS (
        SELECT DISTINCT doc_id, wmin AS fp FROM (
          SELECT doc_id, pos, n_grams,
            min(h) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS wmin
          FROM grams) t
        WHERE pos <= greatest(n_grams - 8, 0))
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        CAST(count(*) AS BIGINT) AS n_shared_fp
      FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id"""))

  // ---------------------------------------------------------------- d18
  /** EXACT DUPLICATED-SUBSTRING REMOVAL (Lee/Ippolito/Nystrom/Zhang/Eck/
    * Callison-Burch/Carlini 2021, "Deduplicating Training Data Makes
    * Language Models Better", arXiv:2107.06499 §4.1 ExactSubstr; public) —
    * the REMOVAL transform the detection lanes (d02–d17) stop short of:
    * every token covered by a word w-gram that occurs at two or more sites
    * in the corpus (cross-document OR within-document, Lee et al.'s
    * definition — all copies go, not all-but-one) is deleted from the
    * document, and the cleaned text is emitted alongside removal counts.
    *
    * Lee et al. reach exact-substring semantics through a suffix array; the
    * Spark-native shape is a stride-1 gram table, and its structural win is
    * that this lane is PAIR-FREE: unlike winnowing (d17), whose fingerprint
    * equi-join emits df²/2 pairs from a boilerplate key and needs the MOSS
    * ceiling, removal only needs the BOOLEAN "this gram occurs ≥ 2 times".
    * A license block shared by a million documents costs one map-side-
    * combined count and a million boolean joins — linear, no cap required.
    * Plan: one grouped count over gram hashes (map-side combine absorbs hot
    * grams), one hash join back (AQE skew-split handles a hot gram's fan-
    * out), one per-doc regroup of duplicated start positions, then a
    * row-local coverage mask — two shuffles of the gram table total, both
    * on uniform md5-derived keys, never a doc×doc join. The grouped-count +
    * join shape is chosen over a `count() OVER (PARTITION BY h)` window
    * deliberately: the window would buffer every copy of a hot gram in one
    * task, the agg reduces them map-side.
    *
    * Gram hashes ride [[graft.functions.CrossEngine.md5Hash60]] so the
    * whole dataflow (gram marking → coverage → text reconstruction) runs
    * under the DuckDB hash gate. Positions are 1-based in both engines; a
    * gram starting at s covers tokens [s, s+w-1]; docs shorter than w
    * tokens have no grams and pass through unchanged. */
  private[graft] def exactSubstringRemove(docs: DataFrame, w: Int): DataFrame = {
    val grams = docs.select(col("doc_id"), toks.as("tk"))
      .select(col("doc_id"), posexplode(wordNgrams(w)).as(Seq("pos0", "g")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"),
        graft.functions.CrossEngine.md5Hash60(col("g")).as("h"))
    val dupH = grams.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select(col("h"))
    val starts = grams.join(dupH, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("ss"))
    // Coverage complement in O(len + k) per document, k = |ss|: `ss` is
    // strictly increasing (distinct positions per doc), and a position p is
    // UNcovered iff it falls strictly between the coverage of consecutive
    // starts — p in [s_j + w, s_{j+1} - 1] for the unique j with
    // s_j <= p < s_{j+1} (earlier starts reach at most s_j + w - 1), or in
    // the head gap [1, s_1 - 1] / tail gap [s_last + w, len]. zip_with
    // pairs each start with its successor (null-padded at the end = tail),
    // so the kept positions materialize as a flatten of guarded sequences —
    // no per-token scan of `ss` (the previous HOF was O(len * k): a
    // 100k-token boilerplate-heavy doc did 10^10 comparisons in one task)
    // and no array-append accumulator (aggregate() copies its buffer per
    // element — O(k^2) for interval merging).
    docs.select(col("doc_id"), toks.as("tk"))
      .join(starts, Seq("doc_id"), "left")
      .withColumn("ss", coalesce(col("ss"), expr("array()")))
      .withColumn("kept", expr(s"""
        CASE WHEN size(ss) = 0 THEN sequence(1, greatest(size(tk), 1))
        ELSE concat(
          IF(element_at(ss, 1) > 1, sequence(1, element_at(ss, 1) - 1), array()),
          flatten(zip_with(ss, slice(ss, 2, size(ss)), (a, b) -> CASE
            WHEN b IS NULL THEN
              IF(a + $w <= size(tk), sequence(a + $w, size(tk)), array())
            WHEN a + $w <= b - 1 THEN sequence(a + $w, b - 1)
            ELSE array() END)))
        END"""))
      // the size(tk)=0 guard above: sequence(1, 0) would DESCEND in Spark;
      // an empty doc has no starts and must keep zero tokens
      .withColumn("kept", expr("IF(size(tk) = 0, array(), kept)"))
      .select(col("doc_id"),
        size(col("tk")).cast("long").as("n_tokens"),
        (size(col("tk")) - size(col("kept"))).cast("long").as("n_removed"),
        concat_ws(" ", expr("transform(kept, i -> element_at(tk, i))")).as("text_clean"))
  }

  /** d18 gate entry. Planted: every 101st doc of ≥ 20 tokens gets a twin
    * (+8e7) carrying a verbatim 10-token run (source tokens 5–14) flanked
    * by filler made unique PER TWIN (source tokens suffixed 'qq'/'rr' plus
    * the source doc_id), so the twin's duplicated-gram set is exactly the
    * run's grams (positions 5–7): the twin must lose precisely tokens 5–14
    * (n_removed = 10) and keep both filler flanks — deterministic, spec-
    * asserted — while the source doc loses the same run (all copies go).
    * The 10-token run with w = 8 yields three shared stride-1 grams whose
    * coverage union is the full run. */
  private val d18 = Q(
    "d18_exact_substring_rm",
    (s, dir) => {
      val base = Tables.documents(s, dir).select(
        graft.functions.CrossEngine.guardedId(col("doc_id"), 80000000L, "d18").as("doc_id"),
        col("text"))
      // the source id is renamed `sid` before the twin select: a select
      // list that aliases `doc_id + 8e7 AS doc_id` would otherwise capture
      // the NEW id in the filler suffix via lateral-column-alias resolution
      val idStr = col("sid").cast("string")
      val twins = base.filter(col("doc_id") % 101 === 0 && size(toks) >= 20)
        .select(col("doc_id").as("sid"), col("text"))
        .select((col("sid") + 80000000L).as("doc_id"),
          concat_ws(" ",
            concat_ws(" ", transform(slice(toks, 1, 4),
              t => concat(t, lit("qq"), idStr))),
            concat_ws(" ", slice(toks, 5, 10)),
            concat_ws(" ", transform(slice(toks, 15, 4),
              t => concat(t, lit("rr"), idStr)))).as("text"))
      exactSubstringRemove(base.unionByName(twins), w = 8)
    },
    Some("""WITH twins AS (
        SELECT doc_id + 80000000 AS doc_id,
          array_to_string(list_transform(tk[1:4], t -> t || 'qq' || CAST(doc_id AS VARCHAR)), ' ')
          || ' ' || array_to_string(tk[5:14], ' ')
          || ' ' || array_to_string(list_transform(tk[15:18], t -> t || 'rr' || CAST(doc_id AS VARCHAR)), ' ') AS text
        FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) t
        WHERE doc_id % 101 = 0 AND len(tk) >= 20),
      corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id, text FROM twins),
      grams AS (
        SELECT doc_id, i AS pos,
          CAST(concat('0x', substring(md5(array_to_string(tk[i : i + 7], ' ')), 1, 15)) AS BIGINT) AS h
        FROM (SELECT doc_id, tk,
            unnest(range(1, CAST(greatest(len(tk) - 7, 0) AS BIGINT) + 1)) AS i
          FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM corpus) t) u),
      duph AS (SELECT h FROM grams GROUP BY h HAVING count(*) >= 2),
      starts AS (
        SELECT doc_id, list_sort(list(pos)) AS ss
        FROM grams JOIN duph USING (h) GROUP BY doc_id)
      SELECT doc_id,
        CAST(len(tk) AS BIGINT) AS n_tokens,
        CAST(len(tk) - len(kept) AS BIGINT) AS n_removed,
        coalesce(
          array_to_string(list_transform(kept, p -> tk[CAST(p AS BIGINT)]), ' '),
          '') AS text_clean
      FROM (
        SELECT c.doc_id, tk,
          list_filter(range(1, len(tk) + 1), i ->
            len(list_filter(coalesce(ss, [])::BIGINT[], s -> s <= i AND i < s + 8)) = 0) AS kept
        FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM corpus) c
        LEFT JOIN starts USING (doc_id)) k"""))

  // ---------------------------------------------------------------- d19
  /** CORPUS-LEVEL EXACT LINE DEDUPLICATION (Penedo et al. 2023, RefinedWeb,
    * arXiv:2306.01116 §3.3 / Rae et al. 2021 Gopher §A.1.2; public) — the
    * boilerplate-removal pass real crawl pipelines run BEFORE document-level
    * dedup: a "line" (navigation menu, cookie banner, footer) that appears
    * in ≥ `maxDf` distinct documents is a site template, not content, and is
    * deleted from every document that carries it. This differs from d18
    * (Lee et al. within-corpus repeated substrings, any 2 occurrences go)
    * in both unit (whole segments, not sliding grams — no coverage mask)
    * and threshold (DOCUMENT frequency, so a quote copied once survives
    * while a 250-site template dies).
    *
    * The synthetic corpus has no newline structure, so the segmenter is
    * parameterized: a "line" is a non-overlapping `blockTokens`-token
    * segment (last partial segment kept). Segmentation is row-local; the
    * document-frequency model is ONE grouped count over 60-bit md5 block
    * hashes ([[graft.functions.CrossEngine.md5Hash60]] — the shuffle
    * carries 8-byte keys, not block text, and map-side combine absorbs a
    * million-document template into one partial per partition); removal is
    * a left-anti hash join of the block table against the (tiny — only
    * blocks with df ≥ maxDf) hot set, exactly d18's pair-free shape:
    * never a doc×doc join, linear in corpus size, no cap needed.
    * Reassembly is a per-doc struct-sort of kept (pos, block) pairs —
    * doc-bounded, no corpus-wide window. */
  /** d19's segmenter, shared with the streaming admission lane (st16):
    * one row per non-overlapping `blockTokens`-token segment (last partial
    * segment kept), 0-based pos, 60-bit md5 block hash. Row-local — safe
    * on a streaming frame unchanged. */
  private[graft] def blockTable(docs: DataFrame, blockTokens: Int): DataFrame =
    docs.select(col("doc_id"), toks.as("tk"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, CAST(ceil(size(tk) / $blockTokens.0) AS INT) - 1),
            i -> array_join(slice(tk, i * $blockTokens + 1, $blockTokens), ' '))"""))
        .as(Seq("pos", "blk")))
      .withColumn("h", graft.functions.CrossEngine.md5Hash60(col("blk")))

  /** d19's document-frequency model: the (tiny) set of block hashes seen
    * in ≥ maxDf distinct documents — what a production pass persists. */
  private[graft] def hotBlocks(docs: DataFrame, blockTokens: Int, maxDf: Int): DataFrame =
    blockTable(docs, blockTokens).groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("doc_freq"))
      .filter(col("doc_freq") >= maxDf).select(col("h"))

  /** Reassembles [[blockTable]] rows (minus removed blocks) into d19's
    * output shape; `totalsOf` supplies per-doc block counts so fully-
    * stripped docs still surface with text_clean = ''. */
  private[graft] def reassembleBlocks(keptBlocks: DataFrame, allBlocks: DataFrame): DataFrame = {
    val kept = keptBlocks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(expr("transform(array_sort(collect_list(struct(pos, blk))), x -> x.blk)"),
          " ").as("text_clean"))
    allBlocks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_blocks"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_blocks"),
        (col("n_blocks") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  private[graft] def lineDedup(docs: DataFrame, blockTokens: Int, maxDf: Int): DataFrame = {
    val blocks = blockTable(docs, blockTokens)
    val hot = hotBlocks(docs, blockTokens, maxDf)
    reassembleBlocks(blocks.join(hot, Seq("h"), "left_anti"), blocks)
  }

  /** The 20-token (= exactly two 10-token blocks) site template d19 plants
    * on every even doc_id — a deterministic stand-in for the nav/footer
    * boilerplate a real crawl repeats across a whole domain. */
  private[graft] val d19Template: String =
    "tmplnav home about contact privacy terms cookie banner subscribe newsletter " +
      "tmplfoot copyright rights reserved sitemap search login register help faq"

  /** d19 gate entry. Planted: even doc_ids get [[d19Template]] PREPENDED
    * (prepending keeps the template aligned to block boundaries — blocks 0
    * and 1 of every even doc are byte-identical, df = 250 ≫ 50), so the
    * pass must strip exactly those two blocks from every even doc
    * (n_removed = 2, text_clean == the original text — spec-asserted) and
    * remove nothing from odd docs. maxDf = 50 sits between the organic
    * ceiling (short partial tail blocks of common single words reach
    * df 28 at sf0.1 — content, not template) and the planted template's
    * 250 — the threshold IS the operator's knob for exactly this
    * content-vs-boilerplate call (RefinedWeb strips lines shared across a
    * domain's pages, not every 3-way coincidence). */
  /** The d19 planted corpus (template prepended to even doc_ids), shared
    * with the st16 streaming twin so the derivations cannot drift. */
  private[graft] def d19Corpus(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      when(col("doc_id") % 2 === 0, concat(lit(d19Template), lit(" "), col("text")))
        .otherwise(col("text")).as("text"))

  /** d19's DuckDB oracle, shared verbatim with st16 (the streaming lane
    * must land on the identical cleaned corpus). */
  private[graft] val d19OracleSql: String = s"""WITH corpus AS (
        SELECT doc_id,
          CASE WHEN doc_id % 2 = 0 THEN '$d19Template' || ' ' || text
            ELSE text END AS text
        FROM documents),
      blocks AS (
        SELECT doc_id, i AS pos,
          array_to_string(tk[(i * 10 + 1) : (i * 10 + 10)], ' ') AS blk
        FROM (SELECT doc_id, tk,
            unnest(range(0, CAST(ceil(len(tk) / 10.0) AS BIGINT))) AS i
          FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM corpus) t) u),
      hashed AS (
        SELECT doc_id, pos, blk,
          CAST(concat('0x', substring(md5(blk), 1, 15)) AS BIGINT) AS h
        FROM blocks),
      hot AS (
        SELECT h FROM hashed GROUP BY h HAVING count(DISTINCT doc_id) >= 50),
      kept AS (
        SELECT doc_id, count(*) AS n_kept,
          string_agg(blk, ' ' ORDER BY pos) AS text_clean
        FROM hashed WHERE h NOT IN (SELECT h FROM hot)
        GROUP BY doc_id),
      totals AS (SELECT doc_id, count(*) AS n_blocks FROM hashed GROUP BY doc_id)
      SELECT t.doc_id, CAST(t.n_blocks AS BIGINT) AS n_blocks,
        CAST(t.n_blocks - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed,
        coalesce(k.text_clean, '') AS text_clean
      FROM totals t LEFT JOIN kept k USING (doc_id)"""

  private val d19 = Q(
    "d19_line_dedup",
    (s, dir) => lineDedup(d19Corpus(Tables.documents(s, dir)),
      blockTokens = 10, maxDf = 50),
    Some(d19OracleSql))

  // ---------------------------------------------------------------- d20
  /** INCREMENTAL LINE-DEDUP MODEL MAINTENANCE — d19's document-frequency
    * model updated the way a production crawl actually grows: per-BATCH
    * block counts (countDistinct within the batch) summed into the running
    * model, never a rescan of history. Correct because ingest batches
    * partition the document space (a doc lands in exactly one batch — the
    * same identity guarantee t25's hash split and d10's id guard provide;
    * a re-crawled doc must re-use its id or be deduped upstream), so
    * per-batch distinct-doc counts are additive. The gate splits the d19
    * corpus into two disjoint batches, merges their count tables, and
    * emits the merged model's hot set WITH frequencies — which must
    * hash-match the full-recompute oracle exactly (the q48 sketch-merge
    * contract, applied to the dedup model).
    *
    * Scale shape: each batch's count is the d19 grouped pass over that
    * batch only; the merge is a groupBy-sum over (hash, df) pairs —
    * model-sized, not corpus-sized. The running model a deployment keeps
    * is exactly `counts`; this query materializes the merge == recompute
    * invariant that makes keeping it sound. */
  private val d20 = Q(
    "d20_line_dedup_incremental",
    (s, dir) => {
      val corpus = d19Corpus(Tables.documents(s, dir))
      def batchCounts(b: DataFrame): DataFrame =
        blockTable(b, blockTokens = 10).groupBy(col("h"))
          .agg(countDistinct(col("doc_id")).as("df"))
      val merged = batchCounts(corpus.filter(col("doc_id") % 2 === 0))
        .unionByName(batchCounts(corpus.filter(col("doc_id") % 2 === 1)))
        .groupBy(col("h")).agg(sum(col("df")).as("doc_freq"))
      merged.filter(col("doc_freq") >= 50).select(col("h"), col("doc_freq"))
    },
    Some(s"""WITH corpus AS (
        SELECT doc_id,
          CASE WHEN doc_id % 2 = 0 THEN '$d19Template' || ' ' || text
            ELSE text END AS text
        FROM documents),
      blocks AS (
        SELECT doc_id, array_to_string(tk[(i * 10 + 1) : (i * 10 + 10)], ' ') AS blk
        FROM (SELECT doc_id, tk,
            unnest(range(0, CAST(ceil(len(tk) / 10.0) AS BIGINT))) AS i
          FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM corpus) t) u)
      SELECT CAST(concat('0x', substring(md5(blk), 1, 15)) AS BIGINT) AS h,
        CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
      FROM blocks GROUP BY 1 HAVING count(DISTINCT doc_id) >= 50"""))

  // ---------------------------------------------------------------- d21
  /** DEDUP TUNING EVAL HARNESS — precision/recall of the banded-MinHash
    * candidate generator against EXACT Jaccard ground truth, the
    * measurement loop that tunes (nPerm, bands, threshold) before a
    * production run (the s21 recall-eval pattern applied to dedup;
    * banding-curve methodology per Leskovec/Rajaraman/Ullman, Mining of
    * Massive Datasets ch. 3 — public).
    *
    * Ground truth is ALL-PAIRS exact Jaccard — the thing a 100 TB corpus
    * can never compute. That is exactly why the harness exists: it runs on
    * a bounded sample slice (the d06 1-in-5 slice here; a hash-sampled
    * slice in production), where all-pairs is affordable, and the measured
    * precision/recall transfers to the full corpus because banding
    * probability depends only on pair similarity, not corpus size. Both
    * sides reuse d06's exact machinery ([[kmBands]] / [[shingleSets]] and
    * the [[kmSqlPrefix]] template), so the eval measures the REAL lane,
    * not a reimplementation. Ratios are integer micros (`div`) — no float
    * division anywhere.
    *
    * The all-pairs truth side carries the standard EXACT size-ratio prune
    * (J >= 0.5 forces 2·min(|a|,|b|) >= max — a pair failing it cannot be
    * a true duplicate, so the expensive intersect never runs for it), and
    * the eval slice is 1-in-10 — the harness's cost knob; the planted
    * truths (sources are doc_id % 10 == 0) all survive the slice. */
  private val d21 = Q(
    "d21_dedup_eval",
    (s, dir) => {
      val docs = withPlantedDups(s, dir).filter(col("doc_id") % 10 === 0)
      val sets = shingleSets(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val banded = kmBands(sets)
      val a = banded.alias("a")
      val b = banded.alias("b")
      val cand = a.join(b, col("a.band") === col("b.band")
          && col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // exact all-pairs Jaccard via the INVERTED-INDEX form (guide §3: no
      // nested-loop joins on data tables): intersections come from a
      // shingle-key equi-join + grouped count — cost O(Σ df²) over shingle
      // doc-frequencies (measured df ≤ 6 on this corpus; sf0.1 slice:
      // 12.6k joined rows) instead of the BroadcastNestedLoopJoin's
      // O(docs²) array_intersect calls (~600k pairs × ~52-gram arrays,
      // the r18 baseline's two concurrent 9.5 s jobs). A pair with zero
      // common shingles cannot reach J >= 0.5, so dropping it is exact;
      // the size-ratio prune and the threshold apply unchanged on the
      // counted form. Results byte-identical (same oracle).
      val ex = sets.select(col("doc_id"), explode(col("sh")).as("g"))
      val sizes = sets.select(col("doc_id"), size(col("sh")).as("n"))
      val truth = ex.alias("x").join(ex.alias("y"),
          col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
        .join(sizes.toDF("doc_a", "na"), Seq("doc_a"))
        .join(sizes.toDF("doc_b", "nb"), Seq("doc_b"))
        .filter(col("na") * 2 >= col("nb") && col("nb") * 2 >= col("na"))
        .filter(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")) >= 0.5)
        .select(col("doc_a"), col("doc_b"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val hits = truth.join(cand, Seq("doc_a", "doc_b"), "left_semi")
      val out = truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
        .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
        .select(col("n_truth"), col("n_cand"), col("n_hit"),
          expr("n_hit * 1000000 div greatest(n_cand, 1)").as("precision_micro"),
          expr("n_hit * 1000000 div greatest(n_truth, 1)").as("recall_micro"))
        .localCheckpoint(true)
      sets.unpersist(false); cand.unpersist(false); truth.unpersist(false)
      out
    },
    Some {
      s"""${kmSqlPrefix(s"SELECT * FROM ($sqlPlanted) p WHERE doc_id % 10 = 0")},
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
        truth AS (
          SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b
          FROM sets sa JOIN sets sb ON sa.doc_id < sb.doc_id
            AND 2 * len(sa.sh) >= len(sb.sh) AND 2 * len(sb.sh) >= len(sa.sh)
          WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
            (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= 0.5),
        hit AS (
          SELECT t.* FROM truth t
          WHERE EXISTS (SELECT 1 FROM cand c
            WHERE c.doc_a = t.doc_a AND c.doc_b = t.doc_b))
      SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
        CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_cand,
        CAST((SELECT count(*) FROM hit) AS BIGINT) AS n_hit,
        (SELECT count(*) FROM hit) * 1000000 //
          greatest((SELECT count(*) FROM cand), 1) AS precision_micro,
        (SELECT count(*) FROM hit) * 1000000 //
          greatest((SELECT count(*) FROM truth), 1) AS recall_micro"""
    })

  // ---------------------------------------------------------------- d22
  /** PER-DOMAIN DOCUMENT CAP (the RefinedWeb/C4 per-host quota — no
    * single domain may contribute more than K documents, with the kept K
    * drawn uniformly, not first-seen; public). The selection rank is a
    * deterministic per-doc md5 hash, so "uniform random per domain"
    * is reproducible and oracle-checkable; the kept set is the K
    * hash-smallest docs per source. Plan: [[graft.functions.TopKPairs]]
    * over the NEGATED hash — the q54 bounded-heap shape — so the shuffle
    * carries K-pair buffers per domain, never the domain's documents. A
    * window row_number would sort-shuffle the whole corpus into #domains
    * partitions; at web scale (millions of pages on one host) the heap
    * plan is the difference between a bounded exchange and a skew
    * disaster. */
  private val d22 = Q(
    "d22_domain_cap",
    (s, dir) => {
      val k = 20
      val ranked = Tables.documents(s, dir).select(col("source"), col("doc_id"),
        graft.functions.CrossEngine.md5Hash60(col("doc_id")).as("h"))
      ranked.groupBy(col("source"))
        .agg(graft.functions.TopK.topKPairs(-col("h"), col("doc_id"), k).as("top"))
        .select(col("source"), posexplode(col("top")).as(Seq("pos", "p")))
        .select(col("source"), (col("pos") + 1).cast("long").as("rnk"),
          col("p.payload").as("doc_id"), (-col("p.sort_key")).as("h"))
    },
    Some("""WITH ranked AS (
        SELECT source, doc_id,
          CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        FROM documents)
      SELECT source, CAST(rn AS BIGINT) AS rnk, doc_id, h FROM (
        SELECT source, doc_id, h,
          row_number() OVER (PARTITION BY source
            ORDER BY h, doc_id DESC) AS rn
        FROM ranked) t WHERE rn <= 20"""))

  // ---------------------------------------------------------------- d23
  /** QUALITY-AWARE CANONICALIZATION — d09/d14 keep the MIN-ID member of
    * each duplicate cluster; real curation keeps the BEST one (C4/
    * RefinedWeb keep the longest/cleanest variant — a crawl's later,
    * richer copy should beat a truncated early snapshot; public). Same
    * cluster machinery ([[connectedComponents]] over verified-Jaccard
    * edges), but the keeper is the max-quality member (quality = token
    * count; ties break to the smaller id), chosen by one map-side
    * `max(struct(n_tokens, -doc_id))` per cluster — no window.
    *
    * The plant makes the rule OBSERVABLE: generation 1 (+1e7) is base +
    * its own first half appended — STRICTLY LONGER than its base, so in
    * every planted cluster the correct keeper is the +1e7 member, which
    * the min-id rule would never pick. Generation 2 (+2e7) is an 80%
    * truncation (always loses). */
  private val d23 = Q(
    "d23_quality_canonical",
    (s, dir) => {
      val base = Tables.documents(s, dir).select(
          graft.functions.CrossEngine.guardedId(col("doc_id"), 10000000L, "d23").as("doc_id"),
          col("text"))
        .filter(col("doc_id") % 10 === 0)
      val g1 = base.select((col("doc_id") + 10000000L).as("doc_id"),
        concat(col("text"), lit(" "),
          array_join(slice(toks, lit(1),
            greatest((size(toks) / 2).cast("int"), lit(1))), " "))
          .as("text"))
      val g2 = base.select((col("doc_id") + 20000000L).as("doc_id"),
        array_join(slice(toks, lit(1),
          greatest((size(toks) * 0.8).cast("int"), lit(1))), " ").as("text"))
      val docs = base.unionByName(g1).unionByName(g2)
        .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sets = shingleSets(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val a = sets.select(col("doc_id").as("src"), col("sh").as("sh_a"))
      val b = sets.select(col("doc_id").as("dst"), col("sh").as("sh_b"))
      val inter = size(array_intersect(col("sh_a"), col("sh_b")))
      val edges = a.join(b,
          col("src") % 10000000L === col("dst") % 10000000L && col("src") < col("dst"))
        .filter(inter.cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - inter) >= 0.5)
        .select(col("src"), col("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val labels = connectedComponents(edges)
      edges.unpersist(false)
      sets.unpersist(false)
      val labeled = labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
        .join(docs.select(col("doc_id"), col("n_tokens")), Seq("doc_id"))
      val keepers = labeled.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"),
          max(struct(col("n_tokens"), (-col("doc_id")).as("neg"))).as("best"))
        .select(col("cluster_id"), col("cluster_size"),
          (-col("best.neg")).as("keeper_id"))
      val out = labeled.join(keepers, Seq("cluster_id"))
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
          col("n_tokens"), (col("doc_id") === col("keeper_id")).as("is_keeper"))
        .localCheckpoint(true)
      labels.unpersist(false)
      docs.unpersist(false)
      out
    },
    Some("""WITH RECURSIVE base AS (
        SELECT doc_id, string_split(text, ' ') AS tk FROM documents WHERE doc_id % 10 = 0),
      docs AS (
        SELECT doc_id, array_to_string(tk, ' ') AS text FROM base
        UNION ALL
        SELECT doc_id + 10000000,
          array_to_string(tk, ' ') || ' ' ||
          array_to_string(tk[1:greatest(len(tk) // 2, 1)], ' ') FROM base
        UNION ALL
        SELECT doc_id + 20000000,
          array_to_string(tk[1:greatest(CAST(floor(len(tk) * 0.8) AS INT), 1)], ' ')
        FROM base),
      docs2 AS (
        SELECT doc_id, text,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM docs),
      sets AS (
        SELECT doc_id, list_distinct(list_transform(
          range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
          i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS sh
        FROM docs2),
      edges AS (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM sets a JOIN sets b
          ON a.doc_id % 10000000 = b.doc_id % 10000000 AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
      und AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
      reach(a, b) AS (
        SELECT src, dst FROM und
        UNION
        SELECT r.a, u.dst FROM reach r JOIN und u ON r.b = u.src),
      labels AS (
        SELECT a AS node, least(a, min(b)) AS cluster_id FROM reach GROUP BY a),
      labeled AS (
        SELECT l.node AS doc_id, l.cluster_id, d.n_tokens
        FROM labels l JOIN docs2 d ON d.doc_id = l.node),
      keepers AS (
        SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size,
          first(doc_id ORDER BY n_tokens DESC, doc_id) AS keeper_id
        FROM labeled GROUP BY cluster_id)
      SELECT lb.doc_id, lb.cluster_id, k.cluster_size, lb.n_tokens,
        lb.doc_id = k.keeper_id AS is_keeper
      FROM labeled lb JOIN keepers k ON lb.cluster_id = k.cluster_id"""))

  // ---------------------------------------------------------------- d24
  /** URL CANONICALIZATION — the normalizer a raw-crawl pipeline runs in
    * front of any host-level policy (VERDICT r9 Missing #2): the same page
    * arrives as `HTTP://WWW.Site.COM:80/p?utm_source=x#frag` and
    * `http://www.site.com/p`, and per-host quotas, URL dedup, and
    * robots/blocklists all operate on the canonical form. Pure codegen'd
    * string expressions (case-fold scheme+authority, strip the fragment,
    * strip scheme-default ports, strip utm_* tracking params with
    * query-separator repair) — they run inside the scan at 100 TB, no
    * extra pass. The regex subset is RE2-compatible (no lookahead), so
    * the DuckDB oracle applies the LITERAL same patterns. */
  def canonicalUrl(u0: Column): Column = {
    val noFrag = regexp_replace(u0, "#.*", "")
    val pfx = regexp_extract(noFrag, "^[a-zA-Z]+://[^/?#]*", 0)
    val lowered = concat(lower(pfx), noFrag.substr(length(pfx) + 1, lit(Int.MaxValue)))
    // scheme-default ports; delimiter captured instead of looked-ahead
    val p1 = regexp_replace(lowered, "^(http://[^/:?#]+):80([/?#])", "$1$2")
    val p2 = regexp_replace(p1, "^(http://[^/:?#]+):80$", "$1")
    val p3 = regexp_replace(p2, "^(https://[^/:?#]+):443([/?#])", "$1$2")
    val p4 = regexp_replace(p3, "^(https://[^/:?#]+):443$", "$1")
    // tracking params: mid/trailing '&utm_x=v' first, then a leading
    // '?utm_x=v&' hands '?' to the next param, then a lone '?utm_x=v'
    val t1 = regexp_replace(p4, "&utm_[a-z]+=[^&]*", "")
    val t2 = regexp_replace(t1, "\\?utm_[a-z]+=[^&]*&", "?")
    regexp_replace(t2, "\\?utm_[a-z]+=[^&]*$", "")
  }

  /** Host grouping key of a canonical URL (authority minus port and a
    * leading `www.` — the per-domain-cap key). */
  def urlHost(canon: Column): Column =
    regexp_replace(regexp_extract(canon, "^[a-z]+://([^/:?#]+)", 1), "^www\\.", "")

  /** Deterministic adversarial URL synthesis shared with the DuckDB
    * oracle: scheme/host case noise, scheme-default and explicit ports,
    * utm params in leading/trailing/only positions, fragments — every
    * raw-form dimension the canonicalizer must erase, plus the ones
    * (`:8080`, `id=` params, www vs bare host) it must keep. */
  private def synthUrl(docId: Column): Column = {
    val m3 = docId % 3
    val hostNum = (docId % 37).cast("string")
    val idp = (docId % 7).cast("string")
    val ds = docId.cast("string")
    concat(
      when(m3 === 0, "HTTP").when(m3 === 1, "https").otherwise("Http"),
      lit("://"),
      when(docId % 2 === 0, concat(lit("WWW.Site-"), hostNum, lit(".COM")))
        .otherwise(concat(lit("site-"), hostNum, lit(".com"))),
      when(docId % 5 === 0, when(m3 === 1, ":443").otherwise(":80"))
        .when(docId % 5 === 1, ":8080").otherwise(""),
      lit("/page/"), (docId % 11).cast("string"),
      when(docId % 4 === 0, concat(lit("?utm_source=x"), ds))
        .when(docId % 4 === 1, concat(lit("?utm_campaign=c&id="), idp))
        .when(docId % 4 === 2, concat(lit("?id="), idp, lit("&utm_medium=m"), ds))
        .otherwise(""),
      when(docId % 6 === 0, concat(lit("#sec"), ds)).otherwise(""))
  }

  /** The lane: synthesize → canonicalize → exact URL dedup (keep min id,
    * count collapsed raw forms) → host extraction → d22's bounded-heap
    * per-host cap (10 hash-smallest canonical pages per host). Scale
    * shape: canonicalization rides the scan; the one data-sized shuffle
    * is the groupBy(canon_url) — irreducible, it IS the dedup; the cap
    * exchange carries 10-pair buffers per host; the kept set (≤ 10 x
    * #hosts rows) broadcasts back to pick up its url + collapse count. */
  private val d24 = Q(
    "d24_url_canonical_host_cap",
    (s, dir) => {
      val k = 10
      val canon = Tables.documents(s, dir).select(col("doc_id"))
        .withColumn("u", synthUrl(col("doc_id")))
        .select(col("doc_id"), canonicalUrl(col("u")).as("canon_url"))
      val dedup = canon.groupBy(col("canon_url"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_dup"))
      val hosts = dedup.select(
        urlHost(col("canon_url")).as("host"), col("canon_url"),
        col("doc_id"), col("n_dup"),
        graft.functions.CrossEngine.md5Hash60(col("canon_url")).as("h"))
        .localCheckpoint(true)
      val kept = hosts.groupBy(col("host"))
        .agg(graft.functions.TopK.topKPairs(-col("h"), col("doc_id"), k).as("top"))
        .select(col("host"), posexplode(col("top")).as(Seq("pos", "p")))
        .select(col("host"), (col("pos") + 1).cast("long").as("rnk"),
          col("p.payload").as("doc_id"))
      hosts.select(col("doc_id"), col("canon_url"), col("n_dup"))
        .join(broadcast(kept), Seq("doc_id"))
        .select(col("host"), col("rnk"), col("doc_id"), col("n_dup"), col("canon_url"))
    },
    Some("""WITH urls AS (
        SELECT doc_id,
          CASE doc_id % 3 WHEN 0 THEN 'HTTP' WHEN 1 THEN 'https' ELSE 'Http' END
          || '://'
          || CASE WHEN doc_id % 2 = 0
               THEN 'WWW.Site-' || CAST(doc_id % 37 AS VARCHAR) || '.COM'
               ELSE 'site-' || CAST(doc_id % 37 AS VARCHAR) || '.com' END
          || CASE WHEN doc_id % 5 = 0
               THEN (CASE WHEN doc_id % 3 = 1 THEN ':443' ELSE ':80' END)
               WHEN doc_id % 5 = 1 THEN ':8080' ELSE '' END
          || '/page/' || CAST(doc_id % 11 AS VARCHAR)
          || CASE WHEN doc_id % 4 = 0 THEN '?utm_source=x' || CAST(doc_id AS VARCHAR)
               WHEN doc_id % 4 = 1 THEN '?utm_campaign=c&id=' || CAST(doc_id % 7 AS VARCHAR)
               WHEN doc_id % 4 = 2 THEN '?id=' || CAST(doc_id % 7 AS VARCHAR)
                 || '&utm_medium=m' || CAST(doc_id AS VARCHAR)
               ELSE '' END
          || CASE WHEN doc_id % 6 = 0 THEN '#sec' || CAST(doc_id AS VARCHAR) ELSE '' END
          AS u
        FROM documents),
      c0 AS (SELECT doc_id, regexp_replace(u, '#.*', '') AS u FROM urls),
      c1 AS (SELECT doc_id,
          lower(regexp_extract(u, '^[a-zA-Z]+://[^/?#]*'))
          || substr(u, length(regexp_extract(u, '^[a-zA-Z]+://[^/?#]*')) + 1) AS u
        FROM c0),
      c2 AS (SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(u,
            '^(http://[^/:?#]+):80([/?#])', '\1\2'),
            '^(http://[^/:?#]+):80$', '\1'),
            '^(https://[^/:?#]+):443([/?#])', '\1\2'),
            '^(https://[^/:?#]+):443$', '\1') AS u
        FROM c1),
      c3 AS (SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(u,
            '&utm_[a-z]+=[^&]*', '', 'g'),
            '\?utm_[a-z]+=[^&]*&', '?'),
            '\?utm_[a-z]+=[^&]*$', '') AS canon_url
        FROM c2),
      dedup AS (
        SELECT canon_url, min(doc_id) AS doc_id, count(*) AS n_dup
        FROM c3 GROUP BY 1),
      hosts AS (
        SELECT regexp_replace(regexp_extract(canon_url, '^[a-z]+://([^/:?#]+)', 1),
            '^www\.', '') AS host,
          canon_url, doc_id, n_dup,
          CAST(concat('0x', substring(md5(canon_url), 1, 15)) AS BIGINT) AS h
        FROM dedup)
      SELECT host, CAST(rn AS BIGINT) AS rnk, doc_id, n_dup, canon_url FROM (
        SELECT host, doc_id, n_dup, canon_url,
          row_number() OVER (PARTITION BY host ORDER BY h, doc_id DESC) AS rn
        FROM hosts) t WHERE rn <= 10"""))

  // ---------------------------------------------------------------- d25
  /** SEMANTIC DEDUP VIA EMBEDDING CLUSTERING (SemDeDup, Abbas et al. '23,
    * public): the third candidate-restriction strategy next to banded LSH
    * (d05/d08) and connected-component closure (d14) — k-means-style
    * CLUSTERS bound the quadratic pair search to within-cluster, then
    * exact cosine inside each cluster drops all but one member of every
    * >= theta group (keep = the smallest id with no smaller-id
    * same-cluster neighbor above theta, SemDeDup's keep-one-per-epsilon-
    * ball rule made deterministic).
    *
    * Determinism for the gate: centroids are the 16 md5-hash-smallest
    * BASE vectors (seeded-sample init — the same bottom-k-by-hash draw as
    * q71, so DuckDB reproduces the centroid set exactly); assignment is
    * the argmin of the codegen'd L2 distance over the broadcast centroid
    * panel via a map-side min(struct) — no window, no iteration. A
    * production deployment would Lloyd-refine the same panel (the s08
    * trained-codebook path shows that shape); the candidate-restriction
    * semantics and the within-cluster verdict are identical.
    *
    * Scale shape (100 TB): the centroid panel is k rows via
    * TakeOrderedAndProject (driver-bounded by construction) and
    * broadcasts; assignment is one scan; the pair join keys on cluster id
    * so each task's quadratic is (corpus/k)^2 — the SemDeDup argument —
    * and the verdict is a distinct + left join keyed by vec_id. Planted
    * exact twins (+1e6 ids, the d08 plant) quantize into their original's
    * cluster structurally and must drop. */
  private val d25 = Q(
    "d25_semdedup_clusters",
    (s, dir) => {
      import graft.functions.VectorExpressions.{cosineF, l2DistSq}
      val base = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val planted = base.filter(col("vec_id") < 20)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      val all0 = base.unionByName(planted)
      val cents = base
        .withColumn("h", graft.functions.CrossEngine.md5Hash60(col("vec_id")))
        .orderBy(col("h"), col("vec_id")).limit(16)
        .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
      val assigned = all0.crossJoin(broadcast(cents))
        .withColumn("dist", l2DistSq(col("embedding"), col("cemb")))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("dist"), col("cid"))).as("m"))
        .select(col("vec_id"), col("m.cid").as("cluster"))
        .join(all0, Seq("vec_id"))
      val v = assigned.select(col("cluster"), col("vec_id"), col("embedding"))
      val drops = v.alias("a").join(v.alias("b"),
          col("a.cluster") === col("b.cluster") &&
            col("a.vec_id") > col("b.vec_id"))
        .filter(cosineF(col("a.embedding"), col("b.embedding")) >= 0.99)
        .select(col("a.vec_id").as("vec_id")).distinct()
        .withColumn("dropflag", lit(true))
      assigned.join(drops, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cluster"),
          coalesce(col("dropflag"), lit(false)).as("dropped"))
    },
    Some("""WITH base AS (SELECT vec_id, embedding FROM embeddings),
      all0 AS (
        SELECT vec_id, embedding FROM base
        UNION ALL
        SELECT vec_id + 1000000, embedding FROM base WHERE vec_id < 20),
      cents AS MATERIALIZED (
        SELECT vec_id AS cid, embedding AS cemb FROM (
          SELECT vec_id, embedding,
            row_number() OVER (ORDER BY
              CAST(concat('0x', substring(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT),
              vec_id) AS rn
          FROM base) t WHERE rn <= 16),
      asg AS MATERIALIZED (
        SELECT vec_id, cid AS cluster, embedding FROM (
          SELECT a.vec_id, c.cid, a.embedding,
            row_number() OVER (PARTITION BY a.vec_id ORDER BY
              list_sum(list_transform(range(1, len(a.embedding) + 1),
                i -> (CAST(a.embedding[i] AS DOUBLE) - CAST(c.cemb[i] AS DOUBLE))
                   * (CAST(a.embedding[i] AS DOUBLE) - CAST(c.cemb[i] AS DOUBLE)))),
              c.cid) AS rn
          FROM all0 a CROSS JOIN cents c) t WHERE rn = 1),
      norms AS MATERIALIZED (
        SELECT vec_id, cluster, embedding,
          sqrt(list_sum(list_transform(embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM asg),
      drops AS (
        SELECT DISTINCT a.vec_id FROM norms a JOIN norms b
          ON a.cluster = b.cluster AND a.vec_id > b.vec_id
        WHERE list_sum(list_transform(range(1, len(a.embedding) + 1),
            i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
          / (a.nrm * b.nrm) >= 0.99)
      SELECT n.vec_id, n.cluster, (d.vec_id IS NOT NULL) AS dropped
      FROM asg n LEFT JOIN drops d ON n.vec_id = d.vec_id"""))

  // ---------------------------------------------------------------- d26
  /** EXACT SIMILARITY JOIN VIA PREFIX FILTERING (AllPairs, Bayardo et al.
    * '07; the PPJoin family, Xiao et al. '08 — public): the EXACT
    * counterpart to the probabilistic LSH lanes — every word-set pair with
    * Jaccard >= tau is found, none missed, without the all-pairs
    * quadratic. Under a fixed global token order (document frequency
    * ascending, then token — rarest first), two sets with J >= tau MUST
    * share a token inside each one's first |x| - ceil(tau*|x|) + 1 tokens
    * (the prefix-filter principle): if all shared tokens sat beyond x's
    * prefix, the intersection could be at most ceil(tau*|x|) - 1, below
    * what J >= tau requires. So candidates = an equi-join of PREFIXES on
    * the token, then an exact verify.
    *
    * All threshold arithmetic is integer-exact in both engines: prefix
    * length uses ceil(4s/5) = (4s+4) div 5, and the verify J >= 0.8 is
    * 9*inter >= 4*(sa+sb) (from inter/(sa+sb-inter) >= 4/5).
    *
    * Scale shape (100 TB): the df table is a grouped count; the per-doc
    * rarity ranking is a window whose partition is ONE document's
    * distinct tokens (bounded by doc length, the q67 per-user precedent);
    * the candidate join keys on the RAREST tokens by construction —
    * anti-skewed exactly where a naive token join is hottest, the
    * AllPairs insight — and the verify is one array_intersect per
    * candidate. Plants: exact copies (ids +1e6, J = 1) and 90%-prefix
    * truncations (ids +2e6); both engines derive both plants, and the
    * spec recounts the result against brute-force all-pairs exactly.
    *
    * Gate bound: this synthetic corpus is template-generated — at sf0.1
    * the FULL corpus carries ~3M organic J>=0.8 pairs, which is a
    * property of the data, not the operator — so the gate runs the
    * derivation on a deterministic 1-in-5 doc slice (the d21 sliced-
    * ground-truth precedent); the algorithm itself is corpus-general. */
  /** The d26 AllPairs derivation, factored for the gate and the scale
    * rehearsal ([[graft.tools.PrefixJoinRehearsal]]): exact word-set
    * Jaccard >= num/den pairs over `docs(doc_id, text)` via prefix
    * filtering. Integer threshold arithmetic throughout: prefix length is
    * s - ceil(num*s/den) + 1 with ceil as (num*s + den - 1) div den, and
    * the verify J >= num/den is inter*(den+num) >= num*(sa+sb). */
  private[graft] def prefixFilterPairs(docs: DataFrame,
      num: Int, den: Int): DataFrame = {
    val sets = docs.select(col("doc_id"),
      array_distinct(split(col("text"), " ")).as("st"))
    val toks = sets.select(col("doc_id"), explode(col("st")).as("w"))
    val dfreq = toks.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val ranked = toks.join(dfreq, Seq("w"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("w"))))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
    val pref = ranked
      .filter(col("rn") <= col("sz") - expr(s"(sz * $num + $den - 1) div $den") + 1)
      .select(col("doc_id"), col("w"))
    val cand = pref.alias("a").join(pref.alias("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db")).distinct()
    cand
      .join(sets.select(col("doc_id").as("da"), col("st").as("sta")), Seq("da"))
      .join(sets.select(col("doc_id").as("db"), col("st").as("stb")), Seq("db"))
      .withColumn("inter", size(array_intersect(col("sta"), col("stb"))).cast("long"))
      .withColumn("sa", size(col("sta")).cast("long"))
      .withColumn("sb", size(col("stb")).cast("long"))
      .filter(col("inter") * (den + num) >= (col("sa") + col("sb")) * num)
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        round(col("inter").cast("double") /
          (col("sa") + col("sb") - col("inter")), 6).as("jaccard"))
  }

  private val d26 = Q(
    "d26_prefix_filter_join",
    (s, dir) => {
      val base = Tables.documents(s, dir)
        .filter(col("doc_id") % 5 === 0)
        .select(
          graft.functions.CrossEngine.guardedId(col("doc_id"), 1000000L, "d26").as("doc_id"),
          col("text"))
      val copies = base.filter(col("doc_id") < 50)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val truncs = base.filter(col("doc_id") >= 50 && col("doc_id") < 100)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          expr("array_join(slice(split(text, ' '), 1, " +
            "CAST((size(split(text, ' ')) * 9 + 9) div 10 AS INT)), ' ')").as("text"))
      val docs = base.unionByName(copies).unionByName(truncs)
        .localCheckpoint(true)
      prefixFilterPairs(docs, 4, 5)
    },
    Some("""WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
      docs AS MATERIALIZED (
        SELECT doc_id, text FROM base
        UNION ALL
        SELECT doc_id + 1000000, text FROM base WHERE doc_id < 50
        UNION ALL
        SELECT doc_id + 2000000,
          array_to_string(string_split(text, ' ')[1:CAST((len(string_split(text, ' ')) * 9 + 9) // 10 AS INT)], ' ')
        FROM base WHERE doc_id >= 50 AND doc_id < 100),
      sets AS MATERIALIZED (
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS st FROM docs),
      toks AS (SELECT doc_id, unnest(st) AS w FROM sets),
      dfreq AS (SELECT w, count(*) AS df FROM toks GROUP BY w),
      ranked AS (
        SELECT t.doc_id, t.w,
          row_number() OVER (PARTITION BY t.doc_id ORDER BY d.df, t.w) AS rn,
          count(*) OVER (PARTITION BY t.doc_id) AS sz
        FROM toks t JOIN dfreq d ON t.w = d.w),
      pref AS (
        SELECT doc_id, w FROM ranked
        WHERE rn <= sz - (sz * 4 + 4) // 5 + 1),
      cand AS (
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM pref a JOIN pref b ON a.w = b.w AND a.doc_id < b.doc_id),
      verified AS (
        SELECT c.da, c.db,
          CAST(len(list_intersect(x.st, y.st)) AS BIGINT) AS inter,
          CAST(len(x.st) AS BIGINT) AS sa, CAST(len(y.st) AS BIGINT) AS sb
        FROM cand c JOIN sets x ON c.da = x.doc_id JOIN sets y ON c.db = y.doc_id)
      SELECT da AS doc_a, db AS doc_b,
        round(CAST(inter AS DOUBLE) / (sa + sb - inter), 6) AS jaccard
      FROM verified WHERE inter * 9 >= (sa + sb) * 4"""))

  // ---------------------------------------------------------------- d27
  /** MEMORIZATION-RATE EVAL (the continuous companion to d16's binary
    * contamination flag — the Carlini-style "what fraction of this text
    * is verbatim from the training set" measurement a release eval
    * reports): per eval doc, the share of its DISTINCT word 8-grams that
    * appear anywhere in the train corpus, as an exact integer-micro ratio.
    * d16 answers "is it leaked at all?"; d27 answers "how much" — the
    * number that distinguishes a quoted sentence from a wholesale copy
    * and feeds extraction-risk thresholds.
    *
    * Reuses the d16 overlap core verbatim (eval side broadcasts, train
    * grams explode map-side and never shuffle — the audited direction)
    * plus one per-eval-doc gram count for the denominator. The planted
    * eval frame makes the extremes provable: verbatim-passage docs score
    * EXACTLY 1000000 micro (every 8-gram of a contiguous train passage is
    * a train gram), vocabulary-disjoint twins exactly 0. */
  private val d27 = Q(
    "d27_memorization_rate",
    (s, dir) => {
      val docs = Tables.documents(s, dir).select(
        graft.functions.CrossEngine.guardedId(col("doc_id"), 50000000L, "d27").as("doc_id"),
        col("text"))
      val ev = evalFrame(docs)
      val base = decontaminate(docs, ev, n = 8)
      val ng = ev.select(col("test_id"), toks.as("tk"))
        .select(col("test_id"), explode(wordNgrams(8)).as("g")).distinct()
        .groupBy(col("test_id")).agg(count(lit(1)).as("n_grams"))
      base.join(ng, Seq("test_id"))
        .select(col("test_id"), col("n_grams"), col("n_overlap_grams"),
          when(col("n_grams") > 0,
            expr("n_overlap_grams * 1000000 div n_grams")).otherwise(lit(0L))
            .as("mem_rate_micro"))
    },
    Some(s"""WITH $decontamSqlPrefix,
      hits AS (
        SELECT e.test_id, count(DISTINCT e.g) AS hit_grams
        FROM evalg e JOIN traing t ON e.g = t.g GROUP BY e.test_id),
      ng AS (
        SELECT test_id, count(*) AS n_grams FROM evalg GROUP BY test_id)
      SELECT ev.test_id, CAST(ng.n_grams AS BIGINT) AS n_grams,
        CAST(coalesce(h.hit_grams, 0) AS BIGINT) AS n_overlap_grams,
        CAST(CASE WHEN ng.n_grams > 0
          THEN coalesce(h.hit_grams, 0) * 1000000 // ng.n_grams
          ELSE 0 END AS BIGINT) AS mem_rate_micro
      FROM eval ev JOIN ng ON ev.test_id = ng.test_id
      LEFT JOIN hits h ON ev.test_id = h.test_id"""))

  // ---------------------------------------------------------------- d28
  /** LEAKAGE-SAFE TRAIN/TEST SPLIT (the guard every eval pipeline needs
    * and most miss: hashing DOC ids into splits puts near-duplicate pairs
    * on opposite sides, so the test set silently contains paraphrases of
    * training documents and every metric inflates — the split must hash
    * the NEAR-DUP CLUSTER, not the document): d09's derivation (exact
    * trigram-shingle Jaccard >= 0.5 within candidate groups -> connected
    * components) labels each doc with its duplicate cluster; the split
    * side is md5(cluster) mod 10 (80/20), so an entire cluster moves
    * together BY CONSTRUCTION. The entry also computes the naive
    * doc-hash side and a per-cluster `leaks_under_naive` verdict — on
    * this corpus the naive split tears a measurable share of clusters
    * apart (the hazard, demonstrated, not asserted).
    *
    * Scale shape: d09's edges + CC (node-keyed joins, lineage-truncated
    * rounds) plus one grouped count-distinct per cluster; the split
    * itself is a row-local hash. */
  private val d28 = Q(
    "d28_leakage_safe_split",
    (s, dir) => {
      val base = Tables.documents(s, dir).select(
          graft.functions.CrossEngine.guardedId(col("doc_id"), 10000000L, "d28").as("doc_id"),
          col("text"))
        .filter(col("doc_id") % 10 === 0)
      val g1 = base.select((col("doc_id") + 10000000L).as("doc_id"),
        array_join(slice(toks, lit(1),
          greatest((size(toks) * 0.8).cast("int"), lit(1))), " ").as("text"))
      val g2 = base.select((col("doc_id") + 20000000L).as("doc_id"),
        array_join(slice(toks, lit(1),
          greatest((greatest((size(toks) * 0.8).cast("int"), lit(1)) * 0.6).cast("int"),
            lit(1))), " ").as("text"))
      val docs = base.unionByName(g1).unionByName(g2)
      val sets = shingleSets(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val a = sets.select(col("doc_id").as("src"), col("sh").as("sh_a"))
      val b = sets.select(col("doc_id").as("dst"), col("sh").as("sh_b"))
      val edges = a.join(b,
          col("src") % 10000000L === col("dst") % 10000000L && col("src") < col("dst"))
        .withColumn("jaccard",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            (size(col("sh_a")) + size(col("sh_b"))
              - size(array_intersect(col("sh_a"), col("sh_b")))))
        .filter(col("jaccard") >= 0.5)
        .select(col("src"), col("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val labels = connectedComponents(edges)
      edges.unpersist(false)
      sets.unpersist(false)
      def side(h: Column): Column =
        when(pmod(h, lit(10L)) < 8, lit("train")).otherwise(lit("test"))
      val splits = labels.select(col("node").as("doc_id"),
        col("label").as("cluster_id"),
        side(graft.functions.CrossEngine.md5Hash60(col("label"))).as("split"),
        side(graft.functions.CrossEngine.md5Hash60(col("node"))).as("naive_split"))
      val leak = splits.groupBy(col("cluster_id"))
        .agg((countDistinct(col("naive_split")) > 1).as("leaks_under_naive"))
      val out = splits.join(leak, Seq("cluster_id"))
        .select(col("doc_id"), col("cluster_id"), col("split"),
          col("leaks_under_naive"))
        .localCheckpoint(true)
      labels.unpersist(false)
      out
    },
    Some("""WITH RECURSIVE base AS (
        SELECT doc_id, string_split(text, ' ') AS tk FROM documents WHERE doc_id % 10 = 0),
      docs AS (
        SELECT doc_id, array_to_string(tk, ' ') AS text FROM base
        UNION ALL
        SELECT doc_id + 10000000,
          array_to_string(tk[1:greatest(CAST(floor(len(tk) * 0.8) AS INT), 1)], ' ') FROM base
        UNION ALL
        SELECT doc_id + 20000000,
          array_to_string(tk[1:greatest(CAST(floor(greatest(CAST(floor(len(tk) * 0.8) AS INT), 1) * 0.6) AS INT), 1)], ' ')
        FROM base),
      sets AS (
        SELECT doc_id, list_distinct(list_transform(
          range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
          i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS sh
        FROM docs),
      edges AS (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM sets a JOIN sets b
          ON a.doc_id % 10000000 = b.doc_id % 10000000 AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
      und AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
      reach(a, b) AS (
        SELECT src, dst FROM und
        UNION
        SELECT r.a, u.dst FROM reach r JOIN und u ON r.b = u.src),
      labels AS (
        SELECT a AS node, least(a, min(b)) AS cluster_id FROM reach GROUP BY a),
      splits AS (
        SELECT node AS doc_id, cluster_id,
          CASE WHEN CAST(concat('0x', substring(md5(CAST(cluster_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 < 8
            THEN 'train' ELSE 'test' END AS split,
          CASE WHEN CAST(concat('0x', substring(md5(CAST(node AS VARCHAR)), 1, 15)) AS BIGINT) % 10 < 8
            THEN 'train' ELSE 'test' END AS naive_split
        FROM labels),
      leak AS (
        SELECT cluster_id, count(DISTINCT naive_split) > 1 AS leaks_under_naive
        FROM splits GROUP BY cluster_id)
      SELECT s.doc_id, s.cluster_id, s.split, l.leaks_under_naive
      FROM splits s JOIN leak l ON s.cluster_id = l.cluster_id"""))

  // ---------------------------------------------------------------- d29
  /** CONTENT-DEFINED CHUNKING DEDUP (Muthitacharoen et al. SOSP'01 LBFS;
    * the FastCDC/Gear family every storage dedup system runs) — chunk
    * boundaries are placed where a rolling fingerprint of the LAST 4
    * tokens satisfies h % 16 == 0, so boundaries are CONTENT-LOCAL: a
    * prefix insertion shifts every byte offset but re-synchronizes at the
    * first content boundary, and all later chunks hash identically. The
    * gate plants exactly that adversary — a 3-token prefix prepended to
    * every doc_id % 97 == 0 document with >= 40 tokens — and emits, per
    * planted pair, the shared-chunk counts of CDC vs FIXED 16-token
    * chunking as oracle-checked VALUES: fixed chunking is destroyed by
    * the shift (every chunk's content moves by 3) while CDC retains all
    * full chunks after the first boundary. This is the failure mode d15's
    * fixed chunk near-dup inherits and the reason production dedup
    * chunks by content.
    *
    * Scale shape: chunking is ROW-LOCAL (HOF over the token array — the
    * boundary fingerprints, chunk splits and chunk hashes never leave the
    * row), and the pair counts are one distinct-chunk equi-join on the
    * chunk hash — the d01 grouped-join shape. No window, no explode
    * before the per-doc chunk list exists. */
  private val d29 = Q(
    "d29_cdc_chunking",
    (s, dir) => {
      val base = Tables.documents(s, dir).select(
        graft.functions.CrossEngine.guardedId(col("doc_id"), 80000000L, "d29").as("doc_id"),
        col("text"))
      val planted = base.filter(col("doc_id") % 97 === 0 && size(toks) >= 40)
        .select((col("doc_id") + 80000000L).as("doc_id"),
          concat(lit("pfx1 pfx2 pfx3 "), col("text")).as("text"))
      val chunked = base.unionByName(planted)
        .select(col("doc_id"), expr(
          """CASE WHEN size(split(text, ' ')) >= 4 THEN
               filter(sequence(4, size(split(text, ' '))), i ->
                 CAST(conv(substring(md5(concat_ws(' ',
                   slice(split(text, ' '), i - 3, 4))), 1, 15), 16, 10) AS BIGINT)
                 % 16 = 0)
             ELSE array() END""").as("bounds"),
          split(col("text"), " ").as("tk"))
        .select(col("doc_id"), col("tk"),
          concat(array(lit(1)), expr("transform(bounds, b -> b + 1)")).as("starts"),
          concat(col("bounds"), array(size(col("tk")))).as("ends"))
        .select(col("doc_id"), col("tk"), expr(
          """filter(transform(sequence(1, size(starts)), j ->
               concat_ws(' ', slice(tk, element_at(starts, j),
                 element_at(ends, j) - element_at(starts, j) + 1))),
             c -> c <> '')""").as("cdc_chunks"), expr(
          """filter(transform(sequence(1, CAST(ceil(size(tk) / 16.0) AS INT)), j ->
               concat_ws(' ', slice(tk, (j - 1) * 16 + 1, 16))),
             c -> c <> '')""").as("fixed_chunks"))
        .localCheckpoint(true)
      def shared(chunksCol: String): DataFrame = {
        val cs = chunked
          .select(col("doc_id"), explode(col(chunksCol)).as("chunk"))
          .select(col("doc_id"), md5(col("chunk")).as("h"))
          .distinct()
        cs.filter(col("doc_id") < 80000000L).alias("a")
          .join(cs.filter(col("doc_id") >= 80000000L).alias("b"),
            col("a.h") === col("b.h") &&
              col("b.doc_id") === col("a.doc_id") + 80000000L)
          .groupBy(col("a.doc_id").as("doc_id"))
          .agg(count(lit(1)).as("n_shared"))
      }
      val nChunks = chunked.filter(col("doc_id") < 80000000L)
        .select(col("doc_id"), size(col("cdc_chunks")).cast("long").as("n_cdc_chunks"))
      planted.select((col("doc_id") - 80000000L).as("doc_id"))
        .join(nChunks, Seq("doc_id"))
        .join(shared("cdc_chunks").withColumnRenamed("n_shared", "n_cdc_shared"),
          Seq("doc_id"), "left")
        .join(shared("fixed_chunks").withColumnRenamed("n_shared", "n_fixed_shared"),
          Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_cdc_chunks"),
          coalesce(col("n_cdc_shared"), lit(0L)).as("n_cdc_shared"),
          coalesce(col("n_fixed_shared"), lit(0L)).as("n_fixed_shared"))
    },
    Some("""WITH base AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 80000000, 'pfx1 pfx2 pfx3 ' || text FROM documents
        WHERE doc_id % 97 = 0 AND len(string_split(text, ' ')) >= 40),
      tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM base),
      bset AS (
        SELECT doc_id, tk,
          CASE WHEN len(tk) >= 4 THEN
            list_filter(range(4, len(tk) + 1), i ->
              CAST(concat('0x', substring(md5(array_to_string(tk[i - 3 : i], ' ')),
                1, 15)) AS BIGINT) % 16 = 0)
          ELSE [] END AS bounds
        FROM tk),
      se AS (
        SELECT doc_id, tk,
          list_concat([1], list_transform(bounds, b -> b + 1)) AS starts,
          list_concat(bounds, [len(tk)]) AS ends
        FROM bset),
      chunks AS (
        SELECT doc_id,
          list_filter(list_transform(range(1, len(starts) + 1), j ->
            array_to_string(tk[starts[j] : ends[j]], ' ')), c -> c <> '') AS cdc_chunks,
          list_filter(list_transform(range(1, CAST(ceil(len(tk) / 16.0) AS BIGINT) + 1),
            j -> array_to_string(tk[(j - 1) * 16 + 1 : j * 16], ' ')), c -> c <> '')
            AS fixed_chunks
        FROM se),
      cdc AS (SELECT DISTINCT doc_id, md5(unnest(cdc_chunks)) AS h FROM chunks),
      fxd AS (SELECT DISTINCT doc_id, md5(unnest(fixed_chunks)) AS h FROM chunks),
      cdcs AS (
        SELECT a.doc_id, count(*) AS n_cdc_shared
        FROM cdc a JOIN cdc b ON a.h = b.h AND b.doc_id = a.doc_id + 80000000
        WHERE a.doc_id < 80000000 GROUP BY a.doc_id),
      fxds AS (
        SELECT a.doc_id, count(*) AS n_fixed_shared
        FROM fxd a JOIN fxd b ON a.h = b.h AND b.doc_id = a.doc_id + 80000000
        WHERE a.doc_id < 80000000 GROUP BY a.doc_id),
      nck AS (
        SELECT doc_id, CAST(len(cdc_chunks) AS BIGINT) AS n_cdc_chunks FROM chunks
        WHERE doc_id < 80000000)
      SELECT p.doc_id, n.n_cdc_chunks,
        CAST(coalesce(c.n_cdc_shared, 0) AS BIGINT) AS n_cdc_shared,
        CAST(coalesce(f.n_fixed_shared, 0) AS BIGINT) AS n_fixed_shared
      FROM (SELECT doc_id FROM documents
            WHERE doc_id % 97 = 0 AND len(string_split(text, ' ')) >= 40) p
      JOIN nck n ON n.doc_id = p.doc_id
      LEFT JOIN cdcs c ON c.doc_id = p.doc_id
      LEFT JOIN fxds f ON f.doc_id = p.doc_id"""))

  // ---------------------------------------------------------------- d30
  /** BLOOM-FILTER EXACT-DEDUP PRE-FILTER (Bloom 1970; Kirsch &
    * Mitzenmacher 2006 double hashing — the membership primitive every
    * streaming exact-dedup admission path runs before touching the full
    * key store: an arriving document probes a fixed-size bit array built
    * over the corpus; a MISS is a guaranteed-new document (no false
    * negatives, a theorem of the structure) that skips the expensive
    * lookup entirely, a HIT pays the exact check and is a false positive
    * with probability (1-e^{-kn/m})^k. At 100 TB this is the difference
    * between every arrival paying a key-store lookup and only the ~dup
    * fraction + FPR paying it.
    *
    * The filter is the engine's native [[graft.functions.BloomSketch]]
    * aggregate — one 65,536-bit buffer (1,024 longs) per group,
    * elementwise-OR merge, Kirsch-Mitzenmacher double hashing over two
    * md5 uniforms — so the filter CONTENT is bit-reproducible in DuckDB
    * and the gate mirrors the words, every probe's membership verdict,
    * the false-positive count and the set-bit population as VALUES.
    * Relation to q56 (bloom semi-join pruning): q56 BUILDS its bitmap
    * relationally — the build shuffles k position rows per key — which
    * is fine for a one-shot runtime filter; d30's aggregate carries ONE
    * fixed-size buffer through the map-side fold (the q46-q57 sketch
    * contract), which is the form a GROUPED build (per-host, per-domain
    * filters) or a streaming admission path needs, and its merge is
    * idempotent OR, so re-merging overlapping partials cannot corrupt
    * it. The probe panel is 20 planted exact duplicates (corpus texts
    * under fresh ids) and 20 fresh texts; the duplicates must ALL hit
    * (structural), the fresh side's verdicts are whatever the fixed
    * hashes give (mirrored, not assumed). */
  private val d30 = Q(
    "d30_bloom_dedup_prefilter",
    (s, dir) => {
      val mBits = 65536
      val kH = 4
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val words: Seq[Long] = docs
        .agg(graft.functions.Bloom.bloomSketch(col("text"), mBits, kH).as("w"))
        .head().getAs[scala.collection.Seq[Long]](0).toSeq
      val sp = s
      import sp.implicits._
      val fresh = (0 until 20).map(i =>
        (2000000000L + i, s"zzfresh#$i", false))
        .toDF("probe_id", "text", "expected_dup")
      val probes = docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000000L).as("probe_id"), col("text"),
          lit(true).as("expected_dup"))
        .unionByName(fresh)
      def h(salt: Int) =
        graft.functions.CrossEngine.md5Hash60(col("text"), Some(salt))
      // membership relationally (the oracle's shape): k position rows per
      // probe, bit test against the broadcast filter words, bool_and
      val memb = probes
        .withColumn("i", explode(lit((0 until kH).toArray)))
        .withColumn("p", (h(101) + col("i") * h(102)) % lit(mBits.toLong))
        .withColumn("word",
          element_at(typedLit(words), (col("p") / 64).cast("int") + 1))
        .withColumn("bit", (col("p") % 64).cast("int"))
        .withColumn("set", expr("(shiftright(word, bit) & 1) = 1"))
        .groupBy(col("probe_id"), col("expected_dup"))
        .agg(bool_and(col("set")).as("in_filter"))
        .localCheckpoint(true)
      val fpCount = memb
        .filter(!col("expected_dup") && col("in_filter")).count()
      val noFalseNeg = memb
        .filter(col("expected_dup") && !col("in_filter")).isEmpty
      val bitsSet = words.map(java.lang.Long.bitCount(_).toLong).sum
      memb
        .withColumn("no_false_negatives", lit(noFalseNeg))
        .withColumn("false_positive_count", lit(fpCount))
        .withColumn("filter_bits_set", lit(bitsSet))
    },
    Some(s"""WITH pos AS (
        SELECT ((CAST(concat('0x', substring(md5(text || '#101'), 1, 15)) AS BIGINT)
               + i * CAST(concat('0x', substring(md5(text || '#102'), 1, 15)) AS BIGINT))
              % 65536) AS p
        FROM documents CROSS JOIN range(0, 4) t(i)),
      words AS (
        -- DuckDB overflow-checks 1<<63; bit 63 is the sign bit, i.e. the
        -- Long.MIN_VALUE literal (same two's-complement word the engine's
        -- 1L << 63 produces)
        SELECT p // 64 AS word_idx,
          bit_or(CASE WHEN p % 64 = 63
            THEN CAST(-9223372036854775808 AS BIGINT)
            ELSE CAST(1 AS BIGINT) << CAST(p % 64 AS INTEGER) END) AS word
        FROM pos GROUP BY 1),
      probes AS (
        SELECT doc_id + 1000000000 AS probe_id, text, true AS expected_dup
        FROM documents WHERE doc_id < 20
        UNION ALL
        SELECT 2000000000 + i, concat('zzfresh#', CAST(i AS VARCHAR)), false
        FROM range(0, 20) t(i)),
      ppos AS (
        SELECT probe_id, expected_dup,
          ((CAST(concat('0x', substring(md5(text || '#101'), 1, 15)) AS BIGINT)
          + i * CAST(concat('0x', substring(md5(text || '#102'), 1, 15)) AS BIGINT))
         % 65536) AS p
        FROM probes CROSS JOIN range(0, 4) t(i)),
      memb AS (
        SELECT probe_id, expected_dup,
          bool_and(coalesce((w.word >> CAST(pp.p % 64 AS INTEGER)) & 1, 0) = 1)
            AS in_filter
        FROM ppos pp LEFT JOIN words w ON w.word_idx = pp.p // 64
        GROUP BY 1, 2),
      summ AS (
        SELECT
          (SELECT count(*) = 0 FROM memb WHERE expected_dup AND NOT in_filter)
            AS no_false_negatives,
          (SELECT CAST(count(*) AS BIGINT) FROM memb
           WHERE NOT expected_dup AND in_filter) AS false_positive_count,
          (SELECT CAST(sum(bit_count(word)) AS BIGINT) FROM words)
            AS filter_bits_set)
      SELECT m.probe_id, m.expected_dup, m.in_filter,
        s.no_false_negatives, s.false_positive_count, s.filter_bits_set
      FROM memb m CROSS JOIN summ s"""))

  // ---------------------------------------------------------------- d31
  /** TAKEDOWN PROPAGATION THROUGH DUP CLUSTERS (the GDPR/DMCA path every
    * production dedup pipeline needs and the s16/s38/w21 takedown theme
    * applied to the dedup lane): deleting documents from a near-dup
    * corpus is NOT just dropping rows — a deleted node can be the
    * cluster's canonical representative (a replacement must be
    * re-elected) or a BRIDGE (the cluster splits into independent
    * components). d31 deletes every 7th synthesized doc from d09's
    * cluster fixture and repairs INCREMENTALLY: only clusters CONTAINING
    * a doomed member are relabeled (one connected-components pass over
    * their surviving edges — deletion can only split, never merge, and
    * edges never cross clusters, so untouched clusters keep their labels
    * verbatim: O(touched clusters) work, the s38 neighborhood-repair
    * contract). Touched-cluster survivors with no remaining edge become
    * singletons; canonicals re-elect as each component's min surviving
    * id (the CC label convention, so re-election is the relabel itself).
    *
    * Gate: the full post-takedown assignment (doc_id, cluster_id, size,
    * is_canonical over every surviving doc) is value-mirrored against
    * DuckDB's recursive-CTE recompute on the survivor graph, and the
    * incremental result is pinned EQUAL to a from-scratch Spark
    * recompute (anti-joins both ways) with zero doomed survivors. */
  private val d31 = Q(
    "d31_takedown_dedup",
    (s, dir) => {
      val base = Tables.documents(s, dir).select(
          graft.functions.CrossEngine.guardedId(col("doc_id"), 10000000L, "d31").as("doc_id"),
          col("text"))
        .filter(col("doc_id") % 10 === 0)
      val g1 = base.select((col("doc_id") + 10000000L).as("doc_id"),
        array_join(slice(toks, lit(1),
          greatest((size(toks) * 0.8).cast("int"), lit(1))), " ").as("text"))
      val g2 = base.select((col("doc_id") + 20000000L).as("doc_id"),
        array_join(slice(toks, lit(1),
          greatest((greatest((size(toks) * 0.8).cast("int"), lit(1)) * 0.6).cast("int"),
            lit(1))), " ").as("text"))
      val docs = base.unionByName(g1).unionByName(g2)
      val sets = shingleSets(docs).localCheckpoint(true)
      val a = sets.select(col("doc_id").as("src"), col("sh").as("sh_a"))
      val b2 = sets.select(col("doc_id").as("dst"), col("sh").as("sh_b"))
      val edges = a.join(b2,
          col("src") % 10000000L === col("dst") % 10000000L && col("src") < col("dst"))
        .withColumn("jaccard",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            (size(col("sh_a")) + size(col("sh_b")) - size(array_intersect(col("sh_a"), col("sh_b")))))
        .filter(col("jaccard") >= 0.5)
        .select(col("src"), col("dst"))
        .localCheckpoint(true)
      val labels0 = connectedComponents(edges).localCheckpoint(true)
      val doomedPred = col("doc_id") % 7 === 0
      val doomed = docs.filter(doomedPred).select(col("doc_id"))
        .localCheckpoint(true)
      val survivors = docs.filter(!doomedPred).select(col("doc_id"))
      // ---- incremental repair: O(touched clusters) ----------------------
      val touched = labels0
        .join(doomed.select(col("doc_id").as("node")), Seq("node"))
        .select(col("label")).distinct().localCheckpoint(true)
      val untouched = labels0.join(touched, Seq("label"), "left_anti")
        .select(col("node"), col("label"))
      val survEdges = edges
        .join(doomed.select(col("doc_id").as("src")), Seq("src"), "left_anti")
        .join(doomed.select(col("doc_id").as("dst")), Seq("dst"), "left_anti")
        .localCheckpoint(true)
      val touchedSurvEdges = survEdges
        .join(labels0.select(col("node").as("src"), col("label")), Seq("src"))
        .join(touched, Seq("label"))
        .select(col("src"), col("dst"))
      val relabeled = connectedComponents(touchedSurvEdges)
      val touchedSurvivors = labels0.join(touched, Seq("label"))
        .join(doomed.select(col("doc_id").as("node")), Seq("node"), "left_anti")
        .select(col("node"))
      val isolated = touchedSurvivors
        .join(relabeled.select(col("node")), Seq("node"), "left_anti")
        .select(col("node"), col("node").as("label"))
      // survivors that never had an edge keep their singleton identity
      val neverConnected = survivors
        .join(labels0.select(col("node").as("doc_id")), Seq("doc_id"), "left_anti")
        .select(col("doc_id").as("node"), col("doc_id").as("label"))
      val newLabels = untouched.unionByName(relabeled).unionByName(isolated)
        .unionByName(neverConnected).localCheckpoint(true)
      // ---- from-scratch recompute (the contract's other side) ------------
      val reLabels = connectedComponents(survEdges)
      val recompute = reLabels.unionByName(
        survivors.join(reLabels.select(col("node").as("doc_id")), Seq("doc_id"), "left_anti")
          .select(col("doc_id").as("node"), col("doc_id").as("label")))
      val keys = Seq("node", "label")
      val increq =
        newLabels.join(recompute, keys, "left_anti").isEmpty &&
        recompute.join(newLabels, keys, "left_anti").isEmpty
      val noDoomed = newLabels
        .join(doomed.select(col("doc_id").as("node")), Seq("node")).isEmpty
      val sizes = newLabels.groupBy(col("label"))
        .agg(count(lit(1)).as("cluster_size"))
      newLabels.join(sizes, Seq("label"))
        .select(col("node").as("doc_id"), col("label").as("cluster_id"),
          col("cluster_size"), (col("node") === col("label")).as("is_canonical"),
          lit(increq).as("incremental_equals_recompute"),
          lit(noDoomed).as("takedown_complete"))
        .localCheckpoint(true)
    },
    Some("""WITH RECURSIVE base AS (
        SELECT doc_id, string_split(text, ' ') AS tk FROM documents WHERE doc_id % 10 = 0),
      docs AS (
        SELECT doc_id, array_to_string(tk, ' ') AS text FROM base
        UNION ALL
        SELECT doc_id + 10000000,
          array_to_string(tk[1:greatest(CAST(floor(len(tk) * 0.8) AS INT), 1)], ' ') FROM base
        UNION ALL
        SELECT doc_id + 20000000,
          array_to_string(tk[1:greatest(CAST(floor(greatest(CAST(floor(len(tk) * 0.8) AS INT), 1) * 0.6) AS INT), 1)], ' ')
        FROM base),
      surv AS (SELECT * FROM docs WHERE doc_id % 7 <> 0),
      sets AS (
        SELECT doc_id, list_distinct(list_transform(
          range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
          i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS sh
        FROM surv),
      edges AS (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM sets a JOIN sets b
          ON a.doc_id % 10000000 = b.doc_id % 10000000 AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
      und AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
      reach(a, b) AS (
        SELECT src, dst FROM und
        UNION
        SELECT r.a, u.dst FROM reach r JOIN und u ON r.b = u.src),
      labels AS (
        SELECT a AS node, least(a, min(b)) AS cluster_id FROM reach GROUP BY a),
      all_labels AS (
        SELECT node, cluster_id FROM labels
        UNION ALL
        SELECT doc_id, doc_id FROM surv
        WHERE doc_id NOT IN (SELECT a FROM reach)),
      sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM all_labels GROUP BY cluster_id)
      SELECT l.node AS doc_id, l.cluster_id, s.cluster_size,
        l.node = l.cluster_id AS is_canonical,
        true AS incremental_equals_recompute, true AS takedown_complete
      FROM all_labels l JOIN sizes s ON l.cluster_id = s.cluster_id"""))

  val all: Seq[Q] = Seq(d01, d02, d03, d04, d05, d06, d07, d08, d09, d10,
    d11, d12, d13, d14, d15, d16, d17, d18, d19, d20, d21, d22, d23, d24,
    d25, d26, d27, d28, d29, d30, d31)
}
