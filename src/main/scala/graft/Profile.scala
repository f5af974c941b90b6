package graft

/** Ad-hoc per-query timing harness: `runMain graft.Profile q24 q87`
  * times just the named queries (prefix match on the qNN key) against
  * `--sf-dir` (default sf0.1), printing per-query seconds for N reps.
  * Use `--explain` to dump the formatted physical plan instead of
  * timing. Complements Bench (whole-suite, driver contract) when
  * iterating on one regression.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val cfg = Config(args)
    val positional = args.filterNot(_.startsWith("--"))
    val sfDir = cfg.get("sf-dir", "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = cfg.get("cpus", "SPARK_GRAFT_CPUS", "32")
    val reps = cfg.get("reps", "SPARK_GRAFT_REPS", "2").toInt
    val explain = args.contains("--explain")
    val aqe = cfg.get("aqe", "SPARK_GRAFT_AQE", "true").toBoolean
    val spark = GraftSession
      .builder(s"local[${cpus.toInt}]", cpus.toInt, appName = "graft-profile")
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wanted = positional.filterNot(_ == "--explain")
    val selected = SparkEntry.queries.filter { case (name, _) =>
      wanted.isEmpty || wanted.exists(w => name.startsWith(w))
    }
    selected.foreach { case (name, fn) =>
      if (explain) {
        println(s"===== $name =====")
        fn(spark, sfDir).explain("formatted")
      } else {
        (1 to reps).foreach { i =>
          val t0 = System.nanoTime()
          // toRdd: full-column materialization — a bare count() lets
          // pruning remove the computed columns of projection queries
          val n = fn(spark, sfDir).queryExecution.toRdd.count()
          val dt = (System.nanoTime() - t0) / 1e9
          GraftSession.releaseAllCaches(spark)
          // Same forced-GC rationale as Bench.sweep: let ContextCleaner
          // delete this rep's shuffle files before the next timed rep.
          System.gc()
          println(f"[profile] $name rep$i: $dt%.3f s ($n rows)")
        }
      }
    }
    spark.stop()
  }
}
