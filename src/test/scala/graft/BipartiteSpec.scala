package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bipartite

/** The guarded one-mode projections (q146/q150/q151/q156's pair
  * builds): brute-force pair equivalence, the support floor, the
  * temporal departure/arrival semantics, and — the reason the
  * operator exists — the per-key fan-out gate killing the query on a
  * planted mega-key. Since r11 the gate is IN-JOB (a raise_error
  * projection over the per-key counts, riding the pair build's own
  * key partitioning — no extra action), so the throw surfaces at
  * materialization time wrapped in Spark's task-failure chain.
  */
class BipartiteSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4, appName = "bipartite-spec")

  /** Concatenated messages down the cause chain — the in-job gate's
    * raise_error arrives wrapped (SparkException → SparkRuntimeException).
    */
  private def messageChain(t: Throwable): String = {
    val b = new StringBuilder
    var cur: Throwable = t
    while (cur != null) { b.append(Option(cur.getMessage).getOrElse("")).append('\n'); cur = cur.getCause }
    b.toString
  }

  test("pairProjection matches brute-force pair counts with the support floor") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val inc = Seq.fill(400)((rnd.nextInt(12).toLong, rnd.nextInt(9).toLong)).distinct
    val df = inc.toDF("k", "item").repartition(5)
    val got = Bipartite
      .pairProjection(df, "k", "item", minSupport = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val want = inc
      .groupBy(_._1)
      .values
      .flatMap { rows =>
        val items = rows.map(_._2).sorted
        for (a <- items; b <- items if a < b) yield (a, b)
      }
      .groupBy(identity)
      .map { case (p, v) => p -> v.size.toLong }
      .filter(_._2 >= 2L)
    assert(got == want)
  }

  test("pairProjection: in-job gate kills the query on a planted mega-key") {
    import spark.implicits._
    // one hub key with 50 items (C(50,2)=1225 pairs) over a maxKeyRows=20 gate
    val hub = (1 to 50).map(i => (99L, i.toLong))
    val ok = (1 to 10).map(i => (i.toLong, i.toLong))
    val df = (hub ++ ok).toDF("k", "item")
    val e = intercept[Exception] {
      Bipartite.pairProjection(df, "k", "item", minSupport = 1, maxKeyRows = 20L).count()
    }
    val msg = messageChain(e)
    assert(msg.contains("maxKeyRows"), msg)
    assert(msg.contains("50"), msg)
    assert(msg.contains("99"), msg) // the offending key is named
  }

  test("pairProjection: empty incidence yields empty pairs (gate tolerates no groups)") {
    import spark.implicits._
    val df = Seq.empty[(Long, Long)].toDF("k", "item")
    assert(Bipartite.pairProjection(df, "k", "item", minSupport = 1).count() == 0L)
  }

  test("temporalPairProjection: strictly-later distinct timed edges, self-pairs excluded") {
    import spark.implicits._
    // key 1 touches item 10@d1, 20@d2, 30@d2; key 2 touches 10@d1, 20@d2
    val df = Seq(
      (1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 2L),
      (2L, 10L, 1L), (2L, 20L, 2L),
      (3L, 40L, 5L) // lone incidence: no pairs
    ).toDF("k", "item", "t")
    val got = Bipartite
      .temporalPairProjection(df, "k", "item", "t")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
      .sorted
    // 10→20 appears via keys 1 AND 2 with identical (dep,arr) — kept
    // as a duplicate (min-fold consumers are duplicate-invariant and
    // a distinct here costs a fan-out-sized shuffle); 20↔30 share day
    // 2 under key 1 → arr > dep fails both ways.
    assert(got == Seq((10L, 20L, 1L, 2L), (10L, 20L, 1L, 2L), (10L, 30L, 1L, 2L)))
  }

  test("temporalPairProjection: in-job gate kills the query on a planted mega-key") {
    import spark.implicits._
    val hub = (1 to 30).map(i => (7L, i.toLong, i.toLong))
    val df = hub.toDF("k", "item", "t")
    val e = intercept[Exception] {
      Bipartite.temporalPairProjection(df, "k", "item", "t", maxKeyRows = 10L).count()
    }
    assert(messageChain(e).contains("maxKeyRows"), messageChain(e))
  }

  test("guards: minSupport and maxKeyRows must be positive") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("k", "item")
    intercept[IllegalArgumentException](Bipartite.pairProjection(df, "k", "item", minSupport = 0))
    intercept[IllegalArgumentException](
      Bipartite.pairProjection(df, "k", "item", minSupport = 1, maxKeyRows = 0L))
  }

  test("releasable handle frees the incidence cache — success AND gate-throw paths") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.size
    // success path: materialize, then release
    val ok = (1 to 10).map(i => (i.toLong, i.toLong)).toDF("k", "item")
    val (pairsOk, releaseOk) = Bipartite.pairProjectionReleasable(ok, "k", "item", minSupport = 1)
    pairsOk.count()
    assert(spark.sparkContext.getPersistentRDDs.size == before + 1)
    releaseOk()
    assert(spark.sparkContext.getPersistentRDDs.size == before)
    // gate-throw path: the in-job raise fires in the CALLER's action,
    // so cleanup is the caller's finally on the same handle (scaladoc
    // contract)
    val hub = (1 to 40).map(i => (1L, i.toLong)).toDF("k", "item")
    val (pairsHub, releaseHub) =
      Bipartite.pairProjectionReleasable(hub, "k", "item", minSupport = 1, maxKeyRows = 5L)
    try intercept[Exception](pairsHub.count())
    finally releaseHub()
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "release handle must unpersist the incidence cache after the gate fires")
  }
}
