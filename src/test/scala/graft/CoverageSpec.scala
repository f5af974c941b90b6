package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Coverage

/** Greedy maximum-coverage selection: hand-computed pick sequences,
  * the (gain DESC, doc ASC) tie-break the SQL oracle mirrors, the
  * fixed-k gain-0 contract, and a randomized driver-side greedy twin.
  */
class CoverageSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4, appName = "coverage-spec")

  private def run(items: Seq[(Long, String)], k: Int): Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    Coverage.greedyMaxCoverage(items.toDF("doc", "item"), k)
      .orderBy(col("step"))
      .collect()
      .toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
  }

  test("hand case: greedy picks the big doc, then best marginal, ties break on doc id") {
    // doc 1: {a,b,c}  doc 2: {b,c,d}  doc 3: {e}  doc 4: {e}
    val items = Seq(
      1L -> "a", 1L -> "b", 1L -> "c",
      2L -> "b", 2L -> "c", 2L -> "d",
      3L -> "e", 4L -> "e")
    // step 1: doc 1 (gain 3; doc 2 ties at 3? no — both 3, tie → doc 1)
    // step 2: doc 2 gains {d}=1, docs 3/4 gain {e}=1 → tie at 1 → doc 2
    // step 3: doc 3 gains {e}=1 (tie with 4 → 3)
    assert(run(items, 3) == Seq((1L, 1L, 3L, 3L), (2L, 2L, 1L, 4L), (3L, 3L, 1L, 5L)))
  }

  test("duplicate items within a doc count once; k past full coverage picks gain-0 docs by id") {
    val items = Seq(1L -> "x", 1L -> "x", 1L -> "y", 2L -> "x", 3L -> "x")
    // step 1: doc 1 (gain 2). steps 2,3: everything covered → gain 0,
    // picked in doc-id order — the fixed-k SQL unroll does the same.
    assert(run(items, 3) == Seq((1L, 1L, 2L, 2L), (2L, 2L, 0L, 2L), (3L, 3L, 0L, 2L)))
  }

  test("k larger than the doc count stops at the doc count") {
    val items = Seq(1L -> "a", 2L -> "b")
    assert(run(items, 5).map(_._2) == Seq(1L, 2L))
  }

  test("guards") {
    import spark.implicits._
    val df = Seq(1L -> "a").toDF("doc", "item")
    intercept[IllegalArgumentException](Coverage.greedyMaxCoverage(df, 0))
    intercept[IllegalArgumentException](Coverage.greedyMaxCoverage(df, 65))
  }

  test("matches a driver-side greedy on random incidence lists, under repartitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(777)
    for (trial <- 1 to 3) {
      val items = Seq.fill(200)((rnd.nextInt(15).toLong, s"w${rnd.nextInt(40)}"))
      val k = 4
      // driver-side greedy twin with the same tie-break
      val byDoc = items.distinct.groupBy(_._1).map { case (d, v) => d -> v.map(_._2).toSet }
      var covered = Set.empty[String]
      var picked = List.empty[(Long, Long, Long, Long)]
      var cum = 0L
      for (step <- 1 to math.min(k, byDoc.size)) {
        val (doc, gain) = byDoc.keys.toSeq
          .filterNot(d => picked.exists(_._2 == d))
          .map(d => d -> (byDoc(d) -- covered).size.toLong)
          .sortBy { case (d, g) => (-g, d) }
          .head
        covered = covered ++ byDoc(doc)
        cum += gain
        picked = picked :+ ((step.toLong, doc, gain, cum))
      }
      val df = items.toDF("doc", "item").repartition(1 + trial * 3)
      val got = Coverage.greedyMaxCoverage(df, k)
        .orderBy(col("step")).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got == picked, s"trial $trial")
    }
  }
}
