package graft

import org.scalatest.funsuite.AnyFunSuite

/** Execution-shape pins for the ITERATIVE tail — the suite's
  * expensive queries (q113/q115/q140/q150/q159), whose loop rounds
  * never appear in the returned frame's static plan, so
  * PlanAuditSpec's operator asserts can't see a loop regression.
  * [[ExecShape.measure]] counts the jobs and stages the scheduler
  * actually submits end-to-end at sf0.001; the counts are pinned here
  * AND recorded in BASELINE.md, so a future "graph tail is 2× slower"
  * bench round is decidable from the record alone: counts unchanged ⇒
  * container/scheduler regression (check calib_sched), counts grown ⇒
  * a plan or loop-structure regression in the tree.
  *
  * Re-derive after an intentional loop change:
  * `tools/run_main.sh graft.ExecShape <query...>` (stable across
  * runs — two identical back-to-back measurements recorded r10).
  */
class ExecShapeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private val pinned = Seq(
    // query                 jobs  stages   (post-loopStage, r10)
    // r17: cache-building plans now compile under AQE
    // (GraftSession's canChangeCachedPlanOutputPartitioning=true), so
    // exchange-fed persists coalesce and each loop family sheds one
    // cache-fill job and a few stages. Re-derived twice, identical.
    ("q113_pagerank", 7, 16),
    ("q115_trustrank", 9, 19),
    ("q140_hits", 22, 56),
    // the bipartite family re-pinned r11 for the IN-JOB fan-out gate:
    // the eager pre-gate job is gone, replaced by the guard join's
    // broadcast/AQE stages (slightly more jobs, measurably less wall
    // time — Bipartite.scala A/B record)
    ("q159_power_iteration", 11, 44),
    // r16: CC auto-selects the driver-local union-find arm below
    // Dedup.LocalEdgeCeil — the loop rounds are gone; the remaining
    // jobs are the pairs pipeline + the mirrored-edge count + keep-
    // list joins (was 31/140 on the distributed rounds, whose shape
    // ConnCompSpec's forced-arm tests still exercise). Derived twice.
    ("q51_conncomp", 14, 26),
    ("q117_label_spread", 13, 35),
    ("q146_copurchase_lift", 20, 45),
    ("q151_trust_dist", 22, 114),
    ("q156_temporal_reach", 19, 79),
    // trainer loops: since r16 the BPE auto-select keys on the
    // OBSERVED vocabulary alone (BpeTrainer.train), so at fixture
    // vocabulary the driver-local arm runs — the one-job-per-merge
    // distributed tail (q175 was 55/107, q176 71/139) collapses to
    // the corpus word-count pass + the guarded collect, exactly as
    // q177/q185 did in r14. The distributed arms' per-round shape is
    // still exercised by BpeTrainerSpec's explicit-arm equality
    // tests. Derived twice, identical.
    ("q175_bpe_train", 8, 12),
    ("q176_bpe_train_bytes", 8, 12),
    // q177/q185 auto-select the DRIVER-SIDE GD arm since r14 (feature
    // count ≪ LocalFeatCeil at every test SF): the 16-epoch × 4-jobs
    // loop tail collapses to the corpus featurization pass + the
    // guarded collects (was 81/192 and 85/199 on the distributed arm,
    // whose per-epoch shape ClassifierTrainerSpec's arm-equality test
    // still exercises). Re-derived twice post-change, identical.
    ("q177_classifier_train", 17, 30),
    // q180/q188 (16-merge train + tokenize) follow the r16 local-arm
    // auto-select: was 29/64 each on the distributed recount arm.
    ("q180_train_tokenize", 14, 33),
    // q185 = q177's featurization + train collects + ONE eval pass;
    // q188 = q180's shape, identical counts (the split filters change
    // volumes, not shapes). Derived twice.
    ("q185_classifier_eval", 21, 37),
    ("q188_bpe_heldout_eval", 14, 33))

  for ((name, jobs, stages) <- pinned)
    test(s"$name submits exactly $jobs jobs / $stages stages at sf0.001") {
      GraftSession.releaseAllCaches(spark)
      val fn = SparkEntry.queries(name)
      val (j, s) = ExecShape.measure(spark, name)(fn(spark, sf).queryExecution.toRdd.count(): Unit)
      assert((j, s) == ((jobs, stages)),
        s"$name execution shape drifted: got jobs=$j stages=$s, pinned jobs=$jobs stages=$stages — " +
          "if the loop change is intentional, re-derive with tools/run_main.sh graft.ExecShape " +
          "and update this pin plus BASELINE.md's shape row")
    }

  test("q150_cosupply_rank submits exactly 15 jobs / 35-50 stages at sf0.001") {
    // Same context-sensitivity class as q139/q148: isolated runs are
    // stable (15/39 re-derived twice, r17 — one cache-fill job fewer
    // under the cached-plan-AQE compile), but inside the full suite
    // the shared session's earlier exchanges get REUSED and whole
    // stages are skipped (observed 44 in-suite on the r13 pins) —
    // fewer stages from reuse is not a regression. Jobs stay the
    // exact pin; stages get a band sized to the observed
    // in-suite/isolated spread.
    GraftSession.releaseAllCaches(spark)
    val fn = SparkEntry.queries("q150_cosupply_rank")
    val (j, s) = ExecShape.measure(spark, "q150_cosupply_rank")(
      fn(spark, sf).queryExecution.toRdd.count(): Unit)
    assert(j == 15, s"q150 jobs drifted: $j != 15")
    assert(s >= 35 && s <= 50, s"q150 stages left the pinned band [35,50]: $s")
  }

  test("q139_kcore submits 85-88 jobs / 675-705 stages at sf0.001") {
    // Isolated runs reproduce 87/693 exactly (twice, r11), but inside
    // the full suite one AQE query-stage job occasionally elides under
    // sibling-suite cache pressure (observed 86/685 once) — the same
    // context-sensitivity class as q148 below, so the pin is a narrow
    // band rather than an exact pair. A structural regression (extra
    // peel rounds, a lost cache re-deriving the pair build) moves the
    // counts by tens-to-hundreds, far outside it.
    GraftSession.releaseAllCaches(spark)
    val fn = SparkEntry.queries("q139_kcore")
    val (j, s) = ExecShape.measure(spark, "q139_kcore")(
      fn(spark, sf).queryExecution.toRdd.count(): Unit)
    assert(j >= 85 && j <= 88, s"q139 jobs left the pinned band [85,88]: $j")
    assert(s >= 675 && s <= 705, s"q139 stages left the pinned band [675,705]: $s")
  }

  test("q148_bfs_dist submits exactly 64 jobs / 300-500 stages at sf0.001") {
    // Root cause of the stage jitter (r10 VERDICT ask #7, measured
    // under the hardened 600 ms listener window, so it is NOT
    // listener lag): BFS runs session-width with AQE ON (the r10
    // LoopLab kept it off the loop clone), and each round's anti-join
    // reads the lazy union of cached per-round frontiers — whether a
    // round's exchange is REUSED or recreated depends on which cache
    // partitions the first-touch race has landed by submit time, so
    // the stage-creation count varies run to run and with session
    // width (observed 353-361 at 32-wide, 353-389 at 4-wide isolated,
    // up to 417 inside the full suite where sibling suites' cache
    // pressure evicts frontier partitions; jobs always exactly 64).
    // The JOB count is the exact pin (jobs = actions = rounds + fixed
    // overhead — the signal that moves if the loop structure
    // regresses); stages are pinned as a tolerance band sized to the
    // full-suite spread so a structural blowup (a lost cache
    // re-deriving whole rounds adds several hundred stages) still
    // fails loudly.
    GraftSession.releaseAllCaches(spark)
    val fn = SparkEntry.queries("q148_bfs_dist")
    val (j, s) = ExecShape.measure(spark, "q148_bfs_dist")(
      fn(spark, sf).queryExecution.toRdd.count(): Unit)
    assert(j == 64, s"q148 jobs drifted: $j != 64")
    assert(s >= 300 && s <= 500, s"q148 stages left the pinned band [300,500]: $s")
  }
}
