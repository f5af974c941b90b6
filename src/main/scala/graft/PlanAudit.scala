package graft

import org.apache.spark.sql.SparkSession

/** Plan-quality audit: prints the formatted physical plan of each
  * declared query so pushdown (`PushedFilters`/`ReadSchema`), join
  * strategy (BroadcastHashJoin vs SortMergeJoin), and exchange counts
  * can be reviewed — "the plan you'd want, not the first one that
  * passed". Run: `sbt "runMain graft.PlanAudit <sfDir> [queryName...]"`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    // argv > env > GRAFT_CONF file (S5); positional args keep working.
    val cfg = Config(args)
    val positional = args.filterNot(_.startsWith("--"))
    val sfDir = positional.headOption.getOrElse(cfg.get("sf-dir", "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val names = positional.drop(1).toSet
    val cpus = cfg.get("cpus", "SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus.toInt, appName = "graft-planaudit")
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (names.isEmpty || names.contains(name)) {
        println(s"\n===== $name =====")
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        println(plan)
        val exchanges = "Exchange".r.findAllIn(plan).length
        val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
        val smj = "SortMergeJoin".r.findAllIn(plan).length
        println(s"[audit] exchanges=$exchanges broadcastJoins=$bhj sortMergeJoins=$smj " +
          s"pushedFilters=${plan.contains("PushedFilters: [Is") || plan.contains("PushedFilters: [Less") || plan.contains("PushedFilters: [Equal")}")
        // Operators that persist at build time (q109's count tables)
        // register CacheManager entries eagerly; sweep so every later
        // query is audited against the same clean state Bench/Verify
        // run it in (live entries would rewrite matching subplans to
        // InMemoryTableScan in the printed plan).
        GraftSession.releaseAllCaches(spark)
      }
    }
    spark.stop()
  }
}
