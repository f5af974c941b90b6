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
      val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        jobStart.put(j.jobId, System.nanoTime())
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = Option(jobStart.get(j.jobId))
        t0.foreach { t =>
          val dt = (System.nanoTime() - t) / 1e9
          if (dt > 2.0) println(f"[probe]   slow job ${j.jobId}: $dt%.1f s")
        }
      }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        shuffleWrite.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        val si = s.stageInfo
        val dur = for (a <- si.completionTime; b <- si.submissionTime) yield (a - b) / 1e3
        dur.filter(_ > 2.0).foreach { d =>
          println(f"[probe]   slow stage ${si.stageId} (${si.name.take(60)}): $d%.1f s, tasks=${si.numTasks}")
        }
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
      val (core, release) = timed("kcore: peel loop (eager rounds)")(
        Graph.kCoreReleasable(pairs, k = 2, maxRounds = 12))
      val n = timed("kcore: output")(core.count())
      println(s"[probe] kcore: $n survivors")
      release(); pairs.unpersist()
      val raw = Similarity
        .nearDupPairs(Tables.embeddings(spark, sfDir), "vec_id", "embedding", threshold = 0.35)
        .select(col("vec_a"), col("vec_b"))
      val (core2, release2) = timed("kcore: loop from raw pair plan")(
        Graph.kCoreReleasable(raw, k = 2, maxRounds = 12))
      val n2 = timed("kcore: output 2")(core2.count())
      println(s"[probe] kcore: $n2 survivors raw")
      release2()
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

    if (only("steps")) {
      // Step-by-step replay of kCore's raw-plan path to locate the
      // 30 s broadcast job.
      import org.apache.spark.storage.StorageLevel
      val raw = Similarity
        .nearDupPairs(Tables.embeddings(spark, sfDir), "vec_id", "embedding", threshold = 0.35)
        .select(col("vec_a"), col("vec_b"))
      val canonPlan = raw
        .select(
          least(col("vec_a").cast("long"), col("vec_b").cast("long")).as("src"),
          greatest(col("vec_a").cast("long"), col("vec_b").cast("long")).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val canonRdd = canonPlan.rdd.persist(StorageLevel.MEMORY_AND_DISK)
      val canon = spark.createDataFrame(canonRdd, canonPlan.schema)
      timed("steps: canon leaf count (AQE off for .rdd)")(canon.count())
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      val e = canon.unionByName(canon.select(col("dst").as("src"), col("src").as("dst")))
      val eRdd = e.rdd.persist(StorageLevel.MEMORY_AND_DISK)
      val eCur = spark.createDataFrame(eRdd, e.schema)
      val alive = eCur.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      timed("steps: alive count (materializes e leaf)")(alive.count())
      val nextEPlan = eCur
        .join(alive.select(col("node").as("src")), Seq("src"))
        .join(alive.select(col("node").as("dst")), Seq("dst"))
      val nextERdd = nextEPlan.rdd.persist(StorageLevel.MEMORY_AND_DISK)
      val nextE = spark.createDataFrame(nextERdd, nextEPlan.schema)
      val next = nextE.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 2)
      timed("steps: round-1 count")(next.count())
      eRdd.unpersist(); nextERdd.unpersist(); canonRdd.unpersist()
    }

    if (only("iso")) {
      // Isolate WHICH part of the pair plan goes slow in the .rdd
      // path: prefilter-only (double cosine, ids out) vs full
      // (decimal verify on survivors).
      import graft.operators.Similarity.{cosine, dot, withSqNorm}
      val emb0 = Tables.embeddings(spark, sfDir)
      def prefilterOnly = {
        val n0 = withSqNorm(graft.operators.Relational.spreadFewSplits(emb0, "vec_id"), "embedding")
          .select(col("vec_id"), col("embedding"), col("sq_norm"))
        val a = n0.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"), col("sq_norm").as("sq_a"))
        val b = n0.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"), col("sq_norm").as("sq_b"))
        val fastCos = call_function("graft_dot", col("emb_a"), col("emb_b")) /
          (sqrt(col("sq_a").cast("double")) * sqrt(col("sq_b").cast("double")))
        a.join(b, col("vec_a") < col("vec_b"))
          .filter(fastCos >= 0.35 - 1e-6)
          .select(col("vec_a"), col("vec_b"))
      }
      timed("iso: prefilter-only .count")(prefilterOnly.count())
      timed("iso: prefilter-only .rdd.count")(prefilterOnly.rdd.count())
      val full = Similarity
        .nearDupPairs(emb0, "vec_id", "embedding", threshold = 0.35)
        .select(col("vec_a"), col("vec_b"))
      timed("iso: full .count")(full.count())
      timed("iso: full .rdd.count")(full.rdd.count())
      timed("iso: full+distinct .rdd.count")(full.distinct().rdd.count())
      val canonShape = full
        .select(
          least(col("vec_a").cast("long"), col("vec_b").cast("long")).as("src"),
          greatest(col("vec_a").cast("long"), col("vec_b").cast("long")).as("dst"))
        .filter(col("src") =!= col("dst"))
      timed("iso: canon-no-distinct .rdd.count")(canonShape.rdd.count())
      timed("iso: canon+distinct .rdd.count")(canonShape.distinct().rdd.count())
    }

    if (only("canon")) {
      // The exact canonicalize+distinct+persist+count prefix the
      // kCore/bfs loops run over the RAW pair plan — isolates whether
      // the raw-path slowdown lives here or in the rounds.
      val raw = Similarity
        .nearDupPairs(Tables.embeddings(spark, sfDir), "vec_id", "embedding", threshold = 0.35)
        .select(col("vec_a"), col("vec_b"))
      val canon = raw
        .select(
          least(col("vec_a").cast("long"), col("vec_b").cast("long")).as("src"),
          greatest(col("vec_a").cast("long"), col("vec_b").cast("long")).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
        .persist()
      val n = timed("canon: count from raw plan")(canon.count())
      println(s"[probe] canon: $n edges")
      val n2 = timed("canon: recount from cache")(canon.count())
      println(s"[probe] canon: $n2 edges cached")
      canon.unpersist()
      val rawOnly = Similarity
        .nearDupPairs(Tables.embeddings(spark, sfDir), "vec_id", "embedding", threshold = 0.35)
        .select(col("vec_a"), col("vec_b"))
      val n3 = timed("canon: bare pair count, no persist")(rawOnly.count())
      println(s"[probe] canon: $n3 bare pairs")
      val withDistinct = Similarity
        .nearDupPairs(Tables.embeddings(spark, sfDir), "vec_id", "embedding", threshold = 0.35)
        .select(col("vec_a"), col("vec_b"))
        .distinct()
      val n4 = timed("canon: +distinct, no persist")(withDistinct.count())
      println(s"[probe] canon: $n4 distinct pairs")
      val viaRdd = Similarity
        .nearDupPairs(Tables.embeddings(spark, sfDir), "vec_id", "embedding", threshold = 0.35)
        .select(col("vec_a"), col("vec_b"))
      val n5 = timed("canon: bare pairs via df.rdd.count")(viaRdd.rdd.count())
      println(s"[probe] canon: $n5 rdd pairs")
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
