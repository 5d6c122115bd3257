package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.harmony._

/** Port of the reference's invariant suite (SURVEY.md §5;
  * /root/reference/tests/testthat/test_integration.R) plus engine-specific
  * properties, on a deterministic synthetic Gaussian-mixture fixture with
  * planted batch offsets (FIXTURES.md §4).
  */
class HarmonySpec extends SparkSpec {

  /** N cells, d dims, 3 latent clusters, 2 batches with an additive batch
    * offset — correction should shrink the offset. */
  private lazy val fixture: DataFrame = {
    val rng = new scala.util.Random(7)
    val d = 5
    val centers = Array.fill(3, d)(rng.nextGaussian() * 3)
    val batchOffset = Array.fill(d)(rng.nextGaussian() * 1.5)
    val rows = (0 until 300).map { i =>
      val cl = i % 3
      val b = if (rng.nextDouble() < 0.5) "b0" else "b1"
      val feats = Array.tabulate(d) { j =>
        (centers(cl)(j) + rng.nextGaussian() * 0.5 +
          (if (b == "b1") batchOffset(j) else 0.0)).toFloat
      }
      (i.toLong, feats, b)
    }
    val sp = spark
    import sp.implicits._
    rows.toDF("cell_id", "features", "batch")
  }

  /** localThreshold=0 forces the DISTRIBUTED path — it's the thing under
    * test here; the local kernel has its own equivalence test below. */
  private def opts(theta: Double, lambda: Double = 1.0) = HarmonyOptions(
    nclust = Some(6), theta = Seq(theta), lambda = Some(Seq(lambda)),
    maxIterHarmony = 2, maxIterCluster = 2, blockSize = 0.2, earlyStop = false,
    localThreshold = 0L)

  private lazy val result = Harmony.fit(fixture, Seq("batch"), opts(theta = 1.0))

  test("shape invariants: corrected matrix, R, state dims (test_integration.R:9-14)") {
    assert(result.corrected.count() === 300)
    val row = result.corrected.head()
    assert(row.getSeq[Float](1).length === 5)
    assert(result.state.K === 6)
    assert(result.state.B === 2)
    assert(result.state.yRowMajor.length === 6 * 5)
    assert(result.state.E.length === 6 * 2 && result.state.O.length === 6 * 2)
  }

  test("R is column-stochastic: entries in [0,1], sums to 1 (test_integration.R:16-20)") {
    val rs = result.cells.collect()
    rs.foreach { c =>
      assert(c.r.length === 6)
      c.r.foreach(v => assert(v >= 0f && v <= 1.0001f))
      val sum = c.r.map(_.toDouble).sum
      assert(math.abs(sum - 1.0) < 1e-4, s"r sums to $sum")
    }
  }

  test("no NaN/Inf in corrected output (test_integration.R:22-26)") {
    val bad = result.cells.collect().exists(_.zCorr.exists(v => v.isNaN || v.isInfinite))
    assert(!bad)
  }

  test("serve: frozen-model mapping — exact on the fit's own rows, loud on unseen levels") {
    val served = Harmony.serve(result, fixture, Seq("batch"))
    assert(served.count() === 300)
    // serving the TRAINING rows with the frozen model: recomputed R is
    // close to (not bit-equal with) the fit's final R — E/O moved during
    // the last sweep — but the corrected output must stay finite and the
    // assignments column-stochastic
    served.collect().foreach { r =>
      val rs = r.getSeq[Float](2)
      assert(math.abs(rs.map(_.toDouble).sum - 1.0) < 1e-4)
      assert(!r.getSeq[Float](1).exists(v => v.isNaN || v.isInfinite))
    }
    // the frozen W IS the fit's map: re-applying it to the fit's stored
    // (zOrig, batch, r) reproduces zCorr bit-for-bit
    val st = result.state
    val (w, k, b, d) = (st.lastW, st.K, st.B, st.d)
    result.cells.collect().foreach { c =>
      val re = Harmony.applyCorrection(c.zOrig, c.batch, c.r, w, k, b, d)
      assert(re.sameElements(c.zCorr))
    }
    // unseen covariate level fails loudly (no silent drop/NaN)
    val sp = spark
    import sp.implicits._
    val alien = Seq((999L, Array.fill(5)(0.1f), "b9"))
      .toDF("cell_id", "features", "batch")
    val e = intercept[org.apache.spark.SparkException] {
      Harmony.serve(result, alien, Seq("batch")).collect()
    }
    assert(e.getMessage.contains("unseen covariate level") ||
      Option(e.getCause).exists(_.getMessage.contains("unseen covariate level")))
    // a model with no correction pass refuses to serve
    val unfitted = Harmony.fit(fixture, Seq("batch"),
      opts(theta = 1.0).copy(maxIterHarmony = 0))
    val err = intercept[IllegalArgumentException] {
      Harmony.serve(unfitted, fixture, Seq("batch"))
    }
    assert(err.getMessage.contains("no correction pass"))
  }

  test("objective decreases across the run") {
    val obj = result.state.objectiveHarmony
    assert(obj.length >= 2)
    assert(obj.last < obj.head, s"objective did not improve: $obj")
  }

  test("higher theta lowers chi^2(O, E) — diversity penalty works (test_integration.R:29-41)") {
    val lo = Harmony.fit(fixture, Seq("batch"), opts(theta = 0.0)).state.chiSquared
    val hi = Harmony.fit(fixture, Seq("batch"), opts(theta = 3.0)).state.chiSquared
    assert(hi < lo, s"chi2 theta=3 ($hi) should be < theta=0 ($lo)")
  }

  test("lambda -> infinity drives the correction to zero (ridge shrinkage)") {
    val res = Harmony.fit(fixture, Seq("batch"), opts(theta = 1.0, lambda = 1e9))
    val maxShift = res.cells.collect().map { c =>
      c.zOrig.zip(c.zCorr).map { case (a, b) => math.abs(a - b) }.max
    }.max
    assert(maxShift < 1e-2, s"huge lambda should freeze the embedding, max shift $maxShift")
  }

  test("lambdas exposes the effective ridge penalties (getLambda parity, op 25)") {
    // fixed-lambda fit: every kept level slot carries the user lambda,
    // intercept slot is unpenalized
    val lam = result.lambdas
    assert(lam.length === result.state.K)
    lam.foreach { row =>
      assert(row.length === result.state.B + 1)
      assert(row(0) === 0.0, "intercept must be unpenalized")
      row.drop(1).foreach(v => assert(v === 1.0 || v === 0.0,
        s"fixed-lambda fit must apply the user lambda (or 0 for pruned): $v"))
    }
    assert(lam.flatMap(_.drop(1)).contains(1.0), "some level must be penalized")

    // auto mode (lambda = None): each kept slot must be exactly
    // alpha * E(k, b) for the E of the fit's final state
    // (/root/reference/src/utils.cpp:159-163)
    val auto = Harmony.fit(fixture, Seq("batch"), HarmonyOptions(
      nclust = Some(6), theta = Seq(1.0), lambda = None, alpha = 0.2,
      maxIterHarmony = 1, maxIterCluster = 2, blockSize = 0.2,
      earlyStop = false, localThreshold = 0L))
    val st = auto.state
    val autoLam = auto.lambdas
    var checked = 0
    for (k <- 0 until st.K; b <- 0 until st.B) {
      val v = autoLam(k)(b + 1)
      if (v != 0.0) {
        assert(math.abs(v - 0.2 * st.E(k * st.B + b)) < 1e-9,
          s"auto lambda(k=$k,b=$b)=$v != alpha*E=${0.2 * st.E(k * st.B + b)}")
        checked += 1
      }
    }
    assert(checked > 0, "auto fit must penalize at least one kept level")
  }

  test("correction shrinks the planted batch offset (mean gap between batches)") {
    def meanGap(df: DataFrame): Double = {
      val sp = spark
      val aggCols = (0 until 5).map(j => avg(element_at(col("features"), j + 1)).as(s"m$j"))
      val agg = df.groupBy("batch").agg(aggCols.head, aggCols.tail: _*)
        .collect().sortBy(_.getString(0))
      (0 until 5).map(j => math.abs(agg(0).getDouble(j + 1) - agg(1).getDouble(j + 1))).sum
    }
    val before = meanGap(fixture)
    val cellsWithBatch = result.cells.toDF().select(
      col("cellId").as("cell_id"), col("zCorr").as("features"),
      when(col("batch")(0) === 0, "b0").otherwise("b1").as("batch"))
    val after = meanGap(cellsWithBatch)
    assert(after < before, s"batch mean gap should shrink: before=$before after=$after")
  }

  test("checkAbort cancels a fit mid-run (op 44) and the session stays usable") {
    // distributed path: let a few polls pass (init + first sweeps), then abort
    val polls = new java.util.concurrent.atomic.AtomicInteger(0)
    val o = HarmonyOptions(nclust = Some(4), maxIterHarmony = 5,
      maxIterCluster = 2, blockSize = 0.2, earlyStop = false,
      localThreshold = 0L,
      checkAbort = Some(() => polls.incrementAndGet() > 3))
    val e = intercept[HarmonyAbortedException] {
      Harmony.fit(fixture, Seq("batch"), o)
    }
    assert(e.getMessage.contains("aborted"))
    // job-group cancellation must leave the session healthy
    assert(fixture.count() === 300)
    // local-kernel path honors the same contract
    val polls2 = new java.util.concurrent.atomic.AtomicInteger(0)
    intercept[HarmonyAbortedException] {
      Harmony.fit(fixture, Seq("batch"), o.copy(localThreshold = 100000L,
        checkAbort = Some(() => polls2.incrementAndGet() > 1)))
    }
  }

  test("op 55 observability: phase timers and sweep-row accumulator populated") {
    val st = result.state
    assert(st.phaseSeconds.nonEmpty && st.phaseSeconds.contains("cluster round"))
    assert(st.phaseSeconds.values.forall(_ >= 0.0))
    // 2 rounds x 2 sweeps over 300 cells -> sweep passes visited rows
    assert(st.rowsVisited.exists(_.value >= 300L))
    assert(st.jobGroup.startsWith("harmony-"))
  }

  test("refuses N < 6 (harmony.cpp:83-86)") {
    val sp = spark
    import sp.implicits._
    val tiny = Seq((1L, Array(1f, 2f), "a"), (2L, Array(2f, 1f), "b"))
      .toDF("cell_id", "features", "batch")
    val e = intercept[Exception] { Harmony.fit(tiny, Seq("batch"), opts(1.0)) }
    assert(e.getMessage.contains("N=2"))
  }

  test("op 6: legacy argument names rejected with migration guidance; unknown args rejected") {
    // the reference's check_legacy_args surface (harmony_option.R:67-131)
    // on the config-map ingestion path
    // "tau" is NOT in this list: fromMap is the harmony_options() layer the
    // reference moved tau into, so it parses as a current option below
    val legacy = Seq("do_pca", "npcs", "block.size",
      "max.iter.harmony", "max.iter.cluster", "epsilon.cluster", "epsilon.harmony")
    legacy.foreach { p =>
      val e = intercept[IllegalArgumentException] {
        HarmonyOptions.fromMap(Map(p -> "1"))
      }
      assert(e.getMessage.nonEmpty, s"$p must carry guidance")
    }
    val unknown = intercept[IllegalArgumentException] {
      HarmonyOptions.fromMap(Map("bananas" -> "3"))
    }
    assert(unknown.getMessage.contains("unhandled"))
    // the happy path parses into the same options a direct construction gives
    val o = HarmonyOptions.fromMap(Map(
      "nclust" -> "8", "theta" -> "2.0,0.5", "lambda" -> "auto",
      "tau" -> "5", "blockMode" -> "sweep", "earlyStop" -> "false"))
    assert(o.nclust === Some(8))
    assert(o.theta === Seq(2.0, 0.5))
    assert(o.lambda === None)
    assert(o.tau === 5.0)
    assert(o.blockMode === BlockMode.Sweep)
    assert(!o.earlyStop)
  }

  test("unknown covariate is rejected (test_integration.R:43-56)") {
    val e = intercept[IllegalArgumentException] {
      Harmony.fit(fixture, Seq("nope"), opts(1.0))
    }
    assert(e.getMessage.contains("nope"))
  }

  test("two covariates: B = total levels across both (test_two_variable.R:20-25)") {
    val two = fixture.withColumn("plate",
      when(col("cell_id") % 3 === 0, "p0").when(col("cell_id") % 3 === 1, "p1").otherwise("p2"))
    val res = Harmony.fit(two, Seq("batch", "plate"),
      HarmonyOptions(nclust = Some(4), theta = Seq(1.0, 0.5),
        maxIterHarmony = 1, maxIterCluster = 1, blockSize = 0.25, earlyStop = false,
        localThreshold = 0L))
    assert(res.state.B === 5) // 2 batch levels + 3 plate levels
    assert(res.corrected.count() === 300)
  }

  test("Sweep block mode satisfies the same invariants") {
    val res = Harmony.fit(fixture, Seq("batch"),
      opts(1.0).copy(blockMode = BlockMode.Sweep))
    val rSums = res.cells.collect().map(_.r.map(_.toDouble).sum)
    rSums.foreach(s => assert(math.abs(s - 1.0) < 1e-4))
    assert(res.state.objectiveHarmony.last < res.state.objectiveHarmony.head)
  }

  test("nclust=1 reduces to a single plain ridge regression (ui.R:34-35)") {
    import breeze.linalg.{DenseMatrix, DenseVector, inv}
    val lambda = 2.5
    val res = Harmony.fit(fixture, Seq("batch"),
      HarmonyOptions(nclust = Some(1), lambda = Some(Seq(lambda)),
        maxIterHarmony = 1, maxIterCluster = 1, earlyStop = false,
        blockMode = BlockMode.Sweep, localThreshold = 0L))

    // with K=1 every r=1, so W = inv(Phi_moe Phi_moe^T + Lambda) Phi_moe Z^T
    val data = fixture.collect().map(r =>
      (r.getAs[scala.collection.Seq[Float]]("features").toArray, r.getAs[String]("batch")))
    val d = 5
    val g = DenseMatrix.zeros[Double](3, 3) // intercept + 2 levels
    val m = DenseMatrix.zeros[Double](3, d)
    data.foreach { case (z, b) =>
      val bi = if (b == "b0") 1 else 2
      g(0, 0) += 1; g(0, bi) += 1; g(bi, 0) += 1; g(bi, bi) += 1
      (0 until d).foreach { j => m(0, j) += z(j); m(bi, j) += z(j) }
    }
    g(1, 1) += lambda; g(2, 2) += lambda
    val w = inv(g) * m

    val corrected = res.cells.collect().map(c => c.cellId -> c).toMap
    data.zipWithIndex.foreach { case ((z, b), i) =>
      val bi = if (b == "b0") 1 else 2
      val expect = (0 until d).map(j => z(j) - w(bi, j))
      val got = corrected(i.toLong).zCorr
      (0 until d).foreach { j =>
        assert(math.abs(expect(j) - got(j)) < 5e-3,
          s"cell $i dim $j: expected ${expect(j)}, got ${got(j)}")
      }
    }
  }

  test("random shapes satisfy invariants (scalacheck properties)") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    import org.scalacheck.Test.{check, Parameters}
    val sp = spark
    import sp.implicits._
    val gen = for {
      n <- Gen.choose(20, 80)
      d <- Gen.choose(2, 6)
      nLevels <- Gen.choose(2, 3)
      seed <- Gen.choose(0L, 1000L)
    } yield (n, d, nLevels, seed)
    val prop = forAll(gen) { case (n, d, nLevels, seed) =>
      val rng = new scala.util.Random(seed)
      val rows = (0 until n).map { i =>
        (i.toLong, Array.fill(d)(rng.nextGaussian().toFloat), s"L${i % nLevels}")
      }
      val df = rows.toDF("cell_id", "features", "batch")
      val res = Harmony.fit(df, Seq("batch"),
        HarmonyOptions(nclust = Some(3), maxIterHarmony = 1, maxIterCluster = 1,
          earlyStop = false, blockMode = BlockMode.Sweep))
      val cells = res.cells.collect()
      cells.length == n &&
        cells.forall(c => math.abs(c.r.map(_.toDouble).sum - 1.0) < 1e-4) &&
        cells.forall(c => !c.zCorr.exists(v => v.isNaN || v.isInfinite))
    }
    val result = check(Parameters.default.withMinSuccessfulTests(4), prop)
    assert(result.passed, s"scalacheck: $result")
  }

  test("local path matches distributed path on the same fixture") {
    val dist = Harmony.fit(fixture, Seq("batch"), opts(1.0))
    val local = Harmony.fit(fixture, Seq("batch"), opts(1.0).copy(localThreshold = 1000L))
    // same seed/salts/formulas; storage precision differs (float r in the
    // distributed path), so compare within a small tolerance
    val dc = dist.cells.collect().map(c => c.cellId -> c.zCorr).toMap
    val lc = local.cells.collect().map(c => c.cellId -> c.zCorr).toMap
    assert(dc.keySet === lc.keySet)
    var maxDiff = 0.0
    dc.foreach { case (id, zd) =>
      val zl = lc(id)
      (zd zip zl).foreach { case (a, b) => maxDiff = math.max(maxDiff, math.abs(a - b)) }
    }
    assert(maxDiff < 5e-2, s"local vs distributed max diff $maxDiff")
    val chiRel = math.abs(dist.state.chiSquared - local.state.chiSquared) /
      math.max(1e-9, dist.state.chiSquared)
    assert(chiRel < 0.05, s"chi2 rel diff $chiRel")
    assert(dist.state.objectiveKmeans.length === local.state.objectiveKmeans.length)
  }

  test("batch pruning path: rare level excluded, both paths agree, output finite") {
    // a second covariate with one very rare level + an aggressive cutoff so
    // pruning genuinely fires (default cutoff never prunes balanced data)
    val withRare = fixture.withColumn("site",
      when(col("cell_id") < 4, "rare").otherwise("common"))
    def o(localThreshold: Long) = HarmonyOptions(
      nclust = Some(4), theta = Seq(1.0, 1.0), batchPropCutoff = 0.05,
      maxIterHarmony = 2, maxIterCluster = 1, blockSize = 0.25,
      earlyStop = false, localThreshold = localThreshold)
    val dist = Harmony.fit(withRare, Seq("batch", "site"), o(0L))
    val local = Harmony.fit(withRare, Seq("batch", "site"), o(1000L))
    val dc = dist.cells.collect()
    assert(dc.forall(c => !c.zCorr.exists(v => v.isNaN || v.isInfinite)))
    // exact pruned-design aggregation: the two paths must still agree
    val lc = local.cells.collect().map(c => c.cellId -> c.zCorr).toMap
    var maxDiff = 0.0
    dc.foreach { c =>
      (c.zCorr zip lc(c.cellId)).foreach { case (a, b) =>
        maxDiff = math.max(maxDiff, math.abs(a - b)) }
    }
    assert(maxDiff < 5e-2, s"pruned-path local vs distributed max diff $maxDiff")
  }

  test("dimsUse projects the embedding before integration (RunHarmony.R:77-87)") {
    val res = Harmony.fit(fixture, Seq("batch"),
      opts(1.0).copy(dimsUse = Some(Seq(0, 2, 4)),
        blockMode = BlockMode.Sweep, maxIterHarmony = 1, maxIterCluster = 1))
    assert(res.state.d === 3)
    assert(res.corrected.head().getSeq[Float](1).length === 3)
  }

  test("sigmaPerCluster overrides the scalar and validates its length") {
    val res = Harmony.fit(fixture, Seq("batch"),
      opts(1.0).copy(sigmaPerCluster = Some(Seq.fill(6)(0.2)),
        blockMode = BlockMode.Sweep, maxIterHarmony = 1, maxIterCluster = 1))
    assert(res.state.sigma.forall(_ === 0.2))
    val e = intercept[IllegalArgumentException] {
      Harmony.fit(fixture, Seq("batch"), opts(1.0).copy(sigmaPerCluster = Some(Seq(0.1))))
    }
    assert(e.getMessage.contains("sigmaPerCluster"))
  }

  test("typed API + objective history accessor") {
    val sp = spark
    import sp.implicits._
    val ds = fixture.as[(Long, Array[Float], String)]
      .map { case (id, f, b) => CellIn(id, f, b) }
    val res = Harmony.fitTyped(ds, Seq("batch"),
      opts(1.0).copy(localThreshold = 1000L))
    assert(res.corrected.count() === 300)
    val hist = res.objectiveHistory.collect()
    assert(hist.length === res.state.objectiveKmeans.length)
    assert(hist.map(_.getLong(1)).max === res.rounds.toLong)
  }

  test("checkpointDir: fit survives losing EVERY cache mid-fit (cluster resilience)") {
    // simulates executor loss / cache eviction on a real cluster: at every
    // round/sweep boundary, blow away ALL caches this fit has created. With
    // a durable checkpointDir the generations replay from files and the fit
    // must complete with the SAME result as an undisturbed run; with
    // localCheckpoint the data would be gone for good.
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val evictions = new java.util.concurrent.atomic.AtomicInteger(0)
    val evicting = HarmonyOptions(nclust = Some(4), maxIterHarmony = 2,
      maxIterCluster = 2, blockSize = 0.25, earlyStop = false,
      localThreshold = 0L, checkpointDir = Some(dir),
      checkAbort = Some(() => {
        sc.getPersistentRDDs.filterNot(kv => before(kv._1))
          .values.foreach { r => r.unpersist(blocking = true); evictions.incrementAndGet() }
        false
      }))
    val res = Harmony.fit(fixture, Seq("batch"), evicting)
    assert(evictions.get() > 0, "the eviction hook never fired")
    assert(res.corrected.count() === 300)
    val cells = res.cells.collect()
    assert(cells.forall(c => !c.zCorr.exists(v => v.isNaN || v.isInfinite)))
    // deterministic replay-from-files: identical to the undisturbed fit
    val clean = Harmony.fit(fixture, Seq("batch"),
      evicting.copy(checkAbort = None, checkpointDir = None))
    val cc = clean.cells.collect().map(c => c.cellId -> c.zCorr).toMap
    var maxDiff = 0.0
    cells.foreach { c =>
      (c.zCorr zip cc(c.cellId)).foreach { case (a, b) =>
        maxDiff = math.max(maxDiff, math.abs(a - b)) }
    }
    assert(maxDiff < 1e-6, s"evicted-and-replayed fit diverged: $maxDiff")
    // best-effort cleanup of the checkpoint files
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Throwable => }
  }

  test("resaltEvery redraws Sequential atoms per round; invariants hold") {
    val res = Harmony.fit(fixture, Seq("batch"),
      opts(1.0).copy(resaltEvery = 1, maxIterHarmony = 3))
    assert(res.corrected.count() === 300)
    val cells = res.cells.collect()
    cells.foreach(c => assert(math.abs(c.r.map(_.toDouble).sum - 1.0) < 1e-4))
    assert(cells.forall(c => !c.zCorr.exists(v => v.isNaN || v.isInfinite)))
    assert(res.state.objectiveHarmony.last < res.state.objectiveHarmony.head)
    assert(res.state.atomSaltGroup >= 1L, "atom salt group never advanced")
  }

  test("atomCap bounds Sequential atoms; invariants hold at a tiny cap") {
    // blockSize 0.2 -> 5 blocks; atomCap 8 -> 8/5 = 1 atom per block, so
    // P = 5 regardless of defaultParallelism — the driver partials cache
    // is 5 atoms where the uncapped run holds 5 × parallelism
    val res = Harmony.fit(fixture, Seq("batch"),
      opts(1.0).copy(atomCap = 8, maxIterHarmony = 3))
    assert(res.corrected.count() === 300)
    val cells = res.cells.collect()
    cells.foreach(c => assert(math.abs(c.r.map(_.toDouble).sum - 1.0) < 1e-4))
    assert(cells.forall(c => !c.zCorr.exists(v => v.isNaN || v.isInfinite)))
    assert(res.state.objectiveHarmony.last < res.state.objectiveHarmony.head)
    // the capped co-partition really is 5 partitions (one atom per block)
    assert(res.cells.rdd.getNumPartitions === 5,
      s"expected 5 capped atoms, got ${res.cells.rdd.getNumPartitions}")
  }

  test("blockOf partitions ids uniformly-ish and deterministically") {
    val counts = new Array[Int](5)
    (0L until 1000L).foreach(id => counts(Harmony.blockOf(id, salt = 3, nBlocks = 5)) += 1)
    assert(counts.sum === 1000)
    counts.foreach(c => assert(c > 120 && c < 280, s"skewed blocks: ${counts.toSeq}"))
    assert(Harmony.blockOf(42L, 7L, 5) === Harmony.blockOf(42L, 7L, 5))
    // different salt reshuffles membership
    val moved = (0L until 1000L).count(id => Harmony.blockOf(id, 1, 5) != Harmony.blockOf(id, 2, 5))
    assert(moved > 500)
  }
}

/** Top-level so spark.implicits can derive its Encoder. */
final case class CellIn(cell_id: Long, features: Array[Float], batch: String)
