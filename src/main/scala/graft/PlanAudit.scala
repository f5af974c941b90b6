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
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSet else Set.empty[String]
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
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
      }
    }
    spark.stop()
  }
}
