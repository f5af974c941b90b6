package graft

/** Per-stage attribution probe: runs each named query ONCE (after an
  * untimed warmup rep) and prints every completed stage's wall time,
  * task count, and name — the instrument for "which stage eats the
  * delta" questions that whole-query wall clocks (Profile) and
  * job/stage counts (ExecShape) cannot answer on a noisy container.
  * `tools/run_main.sh graft.StageProbe q189 [--sf-dir=…] [--cpus=32]
  * [--warmup=1]`
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val cfg = Config(args)
    val sfDir = cfg.get("sf-dir", "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = cfg.get("cpus", "SPARK_GRAFT_CPUS", "32").toInt
    val warmup = cfg.get("warmup", "SPARK_GRAFT_WARMUP", "1").toInt
    val names = args.filterNot(_.startsWith("--")).toSeq
    val spark = GraftSession.local(cpus, appName = "graft-stageprobe")
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Int, Double, Long, Long, Long, Long)]()
    var record = false
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = if (record) {
        val si = s.stageInfo
        val dur = (for (a <- si.completionTime; b <- si.submissionTime) yield (a - b) / 1e3).getOrElse(-1.0)
        stages.add((
          si.stageId, si.name.takeWhile(_ != '\n').take(90), si.numTasks, dur,
          si.taskMetrics.executorRunTime,
          si.taskMetrics.shuffleWriteMetrics.bytesWritten,
          si.taskMetrics.shuffleReadMetrics.totalBytesRead,
          si.taskMetrics.inputMetrics.bytesRead))
      }
    })
    names.foreach { w =>
      val selected = SparkEntry.queries.filter { case (n, _) => n.startsWith(w) }
      selected.foreach { case (name, fn) =>
        (1 to warmup).foreach { _ =>
          try fn(spark, sfDir).queryExecution.toRdd.count()
          catch { case _: Throwable => () }
          GraftSession.releaseAllCaches(spark)
          System.gc()
        }
        stages.clear()
        record = true
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500) // listener bus drain
        record = false
        println(f"===== $name: $dt%.2f s ($n rows) =====")
        import scala.jdk.CollectionConverters._
        stages.asScala.toVector.sortBy(_._1).foreach { case (id, nm, tasks, dur, run, sw, sr, in) =>
          println(f"[stage] $id%4d $dur%7.3f s  tasks=$tasks%3d  runMs=$run%6d  shufWrKB=${sw / 1024}%6d  shufRdKB=${sr / 1024}%6d  inKB=${in / 1024}%6d  $nm")
        }
        GraftSession.releaseAllCaches(spark)
        System.gc()
      }
    }
    spark.stop()
  }
}
