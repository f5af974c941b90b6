package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Graph, Similarity}

/** Stage-decomposition probe for the iterative graph queries
  * (q139 k-core, q140 HITS): times the edge build and the iteration
  * loop SEPARATELY and reports Spark-listener job/stage/shuffle
  * counts, which are deterministic where this container's wall-clock
  * is not (same-code reps swing 2–6× on writeback interference).
  * `runMain graft.GraphProbe [--sf-dir=…] [--only=kcore,hits]`
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val cfg = Config(args)
    val sfDir = cfg.get("sf-dir", "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = cfg.get("cpus", "SPARK_GRAFT_CPUS", "32").toInt
    val only = cfg.get("only", "SPARK_GRAFT_ONLY", "kcore,hits").split(',').toSet
    val spark = GraftSession.local(cpus, appName = "graft-graphprobe")
    spark.sparkContext.setLogLevel("WARN")

    val metrics = new org.apache.spark.scheduler.SparkListener {
      val jobs = new java.util.concurrent.atomic.AtomicLong
      val stages = new java.util.concurrent.atomic.AtomicLong
      val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        shuffleWrite.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(metrics)

    def timed[T](label: String)(f: => T): T = {
      Thread.sleep(300) // let the listener bus drain (private API in Spark 4)
      val (j0, s0, w0) = (metrics.jobs.get, metrics.stages.get, metrics.shuffleWrite.get)
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[probe] $label: $dt%.2f s, jobs=${metrics.jobs.get - j0}, " +
        f"stages=${metrics.stages.get - s0}, shuffleMB=${(metrics.shuffleWrite.get - w0) / 1e6}%.1f")
      r
    }

    if (only("kcore")) {
      val pairs = Similarity
        .nearDupPairs(Tables.embeddings(spark, sfDir), "vec_id", "embedding", threshold = 0.35)
        .select(col("vec_a"), col("vec_b"))
        .persist()
      val nEdges = timed("kcore: pair build")(pairs.count())
      println(s"[probe] kcore: $nEdges undirected edges")
      val (core, release) = Graph.kCoreReleasable(pairs, k = 2, maxRounds = 12)
      val n = timed("kcore: peel loop")(core.count())
      println(s"[probe] kcore: $n survivors")
      release(); pairs.unpersist()
    }

    if (only("bfs")) {
      val emb = Tables.embeddings(spark, sfDir)
      val pairs = Similarity
        .nearDupPairs(emb, "vec_id", "embedding", threshold = 0.35)
        .select(col("vec_a"), col("vec_b"))
        .persist()
      val nEdges = timed("bfs: pair build")(pairs.count())
      println(s"[probe] bfs: $nEdges undirected edges")
      val seeds = emb.filter(col("vec_id") % 7 === 0).select(col("vec_id")).persist()
      val nSeeds = timed("bfs: seed build")(seeds.count())
      println(s"[probe] bfs: $nSeeds seeds")
      val (dist, release) = timed("bfs: frontier loop (eager rounds)")(
        Graph.bfsDistancesReleasable(pairs, seeds, maxHops = 6))
      val n = timed("bfs: output materialization")(dist.count())
      println(s"[probe] bfs: $n reached nodes")
      release(); pairs.unpersist(); seeds.unpersist()
      // Same loop but from the UNPERSISTED pair plan — what q148 pays
      val raw = Similarity
        .nearDupPairs(emb, "vec_id", "embedding", threshold = 0.35)
        .select(col("vec_a"), col("vec_b"))
      val (dist2, release2) = timed("bfs: loop from raw pair plan")(
        Graph.bfsDistancesReleasable(raw, seeds, maxHops = 6))
      val n2 = timed("bfs: output materialization 2")(dist2.count())
      println(s"[probe] bfs: $n2 reached nodes")
      release2()
    }

    if (only("hits")) {
      val e = Tables
        .orders(spark, sfDir)
        .join(Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .persist()
      val nE = timed("hits: edge build")(e.count())
      println(s"[probe] hits: $nE raw directed edges")
      val (ha, release) = Graph.hitsReleasable(e, iterations = 2)
      val n = timed("hits: 2-iteration loop")(ha.count())
      println(s"[probe] hits: $n scored nodes")
      release(); e.unpersist()
    }
    spark.stop()
  }
}
