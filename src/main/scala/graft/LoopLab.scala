package graft

/** Session-conf A/B harness for loop-latency work: times queries
  * under shuffle-width/AQE variants with the Profile protocol
  * (warmup, cache sweep + GC between reps). This is the measurement
  * behind [[graft.operators.Graph.loopStage]]'s edge-derived sizing —
  * rerun it after any loop-structure change to keep the BASELINE.md
  * loop-latency entry honest:
  * `tools/run_main.sh graft.LoopLab q113_pagerank q140_hits --reps=3`
  *
  * Env-gated structural A/B arms to pair with it (same Profile
  * protocol, numbers recorded in the operators' scaladocs +
  * BASELINE.md):
  *  - `GRAFT_TRI_REBIND=on` — q118 triangleCounts back on the narrow
  *    loop session (r11: loses 1.83×; hub-quadratic wedge fan-out
  *    wants session width + AQE skew-split);
  *  - `GRAFT_BIPARTITE_GATE=eager` — r10's pre-job fan-out gate on
  *    q146/q150/q151/q156 (r11: loses on every arm);
  *  - `GRAFT_LOOP_BATCH=2` — batched convergence rounds in CC/kCore
  *    (r11: loses 1.6–2.6×);
  *  - `GRAFT_LOOP_STAGE=off` — all loops back to session-width rounds.
  */
object LoopLab {
  def main(args: Array[String]): Unit = {
    val cfg = Config(args)
    val sfDir = cfg.get("sf-dir", "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = cfg.get("cpus", "SPARK_GRAFT_CPUS", "32").toInt
    val reps = cfg.get("reps", "SPARK_GRAFT_REPS", "3").toInt
    val names = args.filterNot(_.startsWith("--")).toSeq
    val variants: Seq[(String, Map[String, String])] = Seq(
      "base" -> Map.empty,
      "noaqe" -> Map("spark.sql.adaptive.enabled" -> "false"),
      "noaqe_sp8" -> Map(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "8"),
      "aqe_sp8" -> Map("spark.sql.shuffle.partitions" -> "8"))
    val spark = GraftSession.local(cpus, appName = "graft-looplab")
    spark.sparkContext.setLogLevel("WARN")
    def sweep(): Unit = {
      GraftSession.releaseAllCaches(spark)
      System.gc()
      Thread.sleep(300)
    }
    for (name <- names; (vn, confs) <- variants) {
      val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val fn = SparkEntry.queries(name)
        try { fn(spark, sfDir).queryExecution.toRdd.count(): Unit } catch { case _: Throwable => () }
        sweep()
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).queryExecution.toRdd.count()
          val dt = (System.nanoTime() - t0) / 1e9
          sweep()
          dt
        }
        println(f"[looplab] $name $vn min=${times.min}%.3f reps=${times.map(t => f"$t%.2f").mkString(",")}")
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    spark.stop()
  }
}
