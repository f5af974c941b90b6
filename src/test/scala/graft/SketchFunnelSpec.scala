package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** Hand-verified semantics of the count-min sketch and the ordered
  * event funnel (q136/q138's operators).
  */
class SketchFunnelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def occ(toks: String*) = {
    import spark.implicits._
    toks.toDF("tok")
  }

  test("countMinSketch: estimate is >= exact for every item (collisions only add)") {
    val data = occ(Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq.fill(1)("c") ++ Seq.fill(5)("dd"): _*)
    val sk = Relational.countMinSketch(data, "tok", depth = 3, width = 4)
    val exact = data.groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
    val est = Relational
      .cmsEstimate(sk, exact, "tok", depth = 3, width = 4)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(est.length == 4)
    est.foreach { case (tok, ex, cms) => assert(cms >= ex, s"$tok: est $cms < exact $ex") }
    // the total mass per sketch row is conserved: every occurrence
    // lands in exactly one bucket of each row
    val rowMass = sk.groupBy(col("j")).agg(sum(col("cnt")).as("m")).collect()
    assert(rowMass.length == 3 && rowMass.forall(_.getLong(1) == 16L))
  }

  test("countMinSketch: width wide enough to avoid collisions makes the estimate exact") {
    val data = occ(Seq.fill(4)("x") ++ Seq.fill(9)("y"): _*)
    // depth 4 x width 512 over 2 items: P(any row collides) is tiny,
    // and the min over 4 rows needs only ONE collision-free row —
    // deterministic for these fixed md5 values (verified by the assert).
    val sk = Relational.countMinSketch(data, "tok", depth = 4, width = 512)
    val exact = data.groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
    val est = Relational
      .cmsEstimate(sk, exact, "tok", depth = 4, width = 512)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(est == Map("x" -> ((4L, 4L)), "y" -> ((9L, 9L))))
  }

  test("countMinSketch: shard sketches merge by counter addition to the full-corpus sketch") {
    val a = occ("a", "a", "b", "q")
    val b = occ("a", "c", "c", "q")
    val full = Relational.countMinSketch(a.unionByName(b), "tok", depth = 3, width = 8)
    val merged = Relational
      .countMinSketch(a, "tok", depth = 3, width = 8)
      .unionByName(Relational.countMinSketch(b, "tok", depth = 3, width = 8))
      .groupBy(col("j"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
    val f = full.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val m = merged.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(f == m)
  }

  test("countMinSketch: partitioning-invariant and guards reject bad shapes") {
    val data = occ(Seq.tabulate(40)(i => s"t${i % 7}"): _*)
    val one = Relational.countMinSketch(data.repartition(1), "tok", 2, 16)
    val many = Relational.countMinSketch(data.repartition(13), "tok", 2, 16)
    assert(
      one.orderBy("j", "bucket").collect().toSeq ==
        many.orderBy("j", "bucket").collect().toSeq)
    intercept[IllegalArgumentException](Relational.countMinSketch(data, "tok", 0, 16))
    intercept[IllegalArgumentException](Relational.countMinSketch(data, "tok", 9, 16))
    intercept[IllegalArgumentException](Relational.countMinSketch(data, "tok", 4, 1))
  }

  private def events(rows: (Long, String, Long)*) = {
    import spark.implicits._
    rows.toDF("user_id", "event_type", "ts_us")
  }

  test("funnelStages: strictly-after recurrence, dropouts carry nulls, non-entrants absent") {
    val ev = events(
      // user 1 completes in order
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // user 2: click BEFORE the first view must not count; the later
      // purchase must not count either (stage 2 never happened)
      (2L, "click", 5L), (2L, "view", 10L), (2L, "purchase", 50L),
      // user 3: purchases exist but both precede the first qualifying
      // click at 20 — stage 3 unreached
      (3L, "view", 10L), (3L, "purchase", 15L), (3L, "click", 20L), (3L, "purchase", 18L),
      // user 4 never views — not in the funnel at all
      (4L, "click", 1L), (4L, "purchase", 2L),
      // user 5: two views, the FIRST one anchors; click between them counts
      (5L, "view", 100L), (5L, "click", 150L), (5L, "view", 200L), (5L, "purchase", 160L))
    val out = Relational
      .funnelStages(ev, "user_id", "event_type", "ts_us", Seq("view", "click", "purchase"))
      .collect()
      .map(r =>
        r.getLong(0) -> (
          Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toMap
    assert(out == Map(
      1L -> ((Some(10L), Some(20L), Some(30L))),
      2L -> ((Some(10L), None, None)),
      3L -> ((Some(10L), Some(20L), None)),
      5L -> ((Some(100L), Some(150L), Some(160L)))))
  }

  test("funnelStages: guards reject empty and duplicate step lists") {
    val ev = events((1L, "view", 1L))
    intercept[IllegalArgumentException](
      Relational.funnelStages(ev, "user_id", "event_type", "ts_us", Seq.empty))
    intercept[IllegalArgumentException](
      Relational.funnelStages(ev, "user_id", "event_type", "ts_us", Seq("view", "view")))
  }
}
