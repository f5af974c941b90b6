package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** Edge semantics of the temporal / skew operators. */
class RelationalOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("applyChanges: delete removes, update replaces, insert appends, untouched rows survive") {
    import spark.implicits._
    import graft.operators.Relational
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")
    val changes = Seq(
      (1L, null.asInstanceOf[String], "D"),
      (2L, "B2", "U"),
      (9L, "new", "I")).toDF("k", "v", "op")
    val out = Relational
      .applyChanges(snap, changes, Seq("k"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(out == Map(2L -> "B2", 3L -> "c", 4L -> "d", 9L -> "new"))
  }

  test("applyChanges: idempotent when the batch is re-applied") {
    import spark.implicits._
    import graft.operators.Relational
    val snap = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val changes = Seq((1L, "A1", "U"), (5L, "e", "I")).toDF("k", "v", "op")
    val once = Relational.applyChanges(snap, changes, Seq("k"))
    val twice = Relational.applyChanges(once, changes, Seq("k"))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("asOfJoinBackward: latest preceding match, equal-time tie matches, no-match is NULL") {
    import spark.implicits._
    val left = Seq((1L, 100L, "l1"), (1L, 50L, "l2"), (2L, 10L, "l3"))
      .toDF("k", "lt", "lv")
    val right = Seq((1L, 40L, "r40"), (1L, 100L, "r100"), (1L, 120L, "r120"), (3L, 5L, "rx"))
      .toDF("k", "rt", "rv")
    val out = Relational
      .asOfJoinBackward(left, right, Seq("k"), "lt", "rt", Seq("rv"))
      .collect()
      .map(r => r.getString(r.fieldIndex("lv")) ->
        (if (r.isNullAt(r.fieldIndex("asof_rv"))) null else r.getString(r.fieldIndex("asof_rv"))))
      .toMap
    assert(out("l1") == "r100") // equal time matches (>= semantics)
    assert(out("l2") == "r40")  // latest preceding
    assert(out("l3") == null)   // key with no right rows
  }

  test("saltedAgg: result-identical to direct groupBy on skewed input") {
    import spark.implicits._
    // one hot key (90%), two cold keys
    val skewed = ((1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 60).map(i => ("cold1", i.toLong)) ++
      (1 to 40).map(i => ("cold2", i.toLong))).toDF("k", "v").repartition(8)
    val salted = Relational
      .saltedAgg(
        skewed,
        Seq("k"),
        salts = 4,
        partialAggs = Seq(sum(col("v")).as("ps"), count(lit(1)).as("pn")),
        mergeAggs = Seq(sum(col("ps")).as("sum_v"), sum(col("pn")).as("n")))
    val direct = skewed.groupBy("k").agg(sum(col("v")).as("sum_v"), count(lit(1)).as("n"))
    assert(salted.except(direct).count() == 0)
    assert(direct.except(salted).count() == 0)
  }

  test("bloomPrefilter: never drops a true match, prunes most non-matches") {
    import spark.implicits._
    val big = (1L to 2000L).map(i => (i, s"r$i")).toDF("k", "v")
    val small = Seq(10L, 500L, 1500L, 1999L).map(k => Tuple1(k)).toDF("sk")
    val pruned = Relational.bloomPrefilter(big, "k", small, "sk")
    val kept = pruned.select("k").as[Long].collect().toSet
    // no false negatives — every actual key survives
    assert(Set(10L, 500L, 1500L, 1999L).subsetOf(kept))
    // and the filter actually prunes (4096 bits, 3 hashes, 4 keys ->
    // expected FP rate well under 1%)
    assert(kept.size < 50, s"kept ${kept.size}")
    // exact join over the pruned side == exact join over the full side
    val j1 = pruned.join(small, col("k") === col("sk")).select("k", "v")
    val j2 = big.join(small, col("k") === col("sk")).select("k", "v")
    assert(j1.except(j2).count() == 0 && j2.except(j1).count() == 0)
  }

  test("bloomPrefilter: empty small side prunes everything") {
    import spark.implicits._
    val big = (1L to 100L).map(i => (i, i)).toDF("k", "v")
    val none = Seq.empty[Long].map(Tuple1(_)).toDF("sk")
    assert(Relational.bloomPrefilter(big, "k", none, "sk").count() == 0)
  }

  test("globalRowNumber matches the single-reducer window on shuffled input") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val keys = rnd.shuffle((1L to 500L).toList)
    val df = keys.map(k => (k, s"v$k")).toDF("k", "v").repartition(3)
    val got = Relational
      .globalRowNumber(df, "k", numPartitions = 5)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._3)
    // rank i holds key i: the same total order row_number() OVER
    // (ORDER BY k) produces, with every original column carried along
    assert(got.map(_._3).toSeq == (1L to 500L))
    assert(got.map(_._1).toSeq == (1L to 500L))
    assert(got.forall { case (k, v, _) => v == s"v$k" })
  }

  test("exactQuantiles matches Spark's percentile aggregate bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // duplicates + odd count exercise both integral and fractional ranks
    val vals = (1 to 501).map(_ => math.floor(rnd.nextDouble() * 100) / 4.0)
    val df = rnd.shuffle(vals).toDF("x").repartition(3)
    val ps = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)
    val got = Relational
      .exactQuantiles(df, "x", ps, numPartitions = 5)
      .collect()(0)
    val want = df
      .agg(
        expr("percentile(x, 0.0)"), expr("percentile(x, 0.25)"), expr("percentile(x, 0.5)"),
        expr("percentile(x, 0.75)"), expr("percentile(x, 0.9)"), expr("percentile(x, 1.0)"))
      .collect()(0)
    ps.indices.foreach { i =>
      assert(got.getDouble(i) == want.getDouble(i), s"p=${ps(i)}")
    }
  }

  test("exactQuantiles: empty input yields one all-NULL row") {
    import spark.implicits._
    val out = Relational
      .exactQuantiles(Seq.empty[Double].toDF("x"), "x", Seq(0.5, 0.9))
      .collect()
    assert(out.length == 1 && out(0).isNullAt(0) && out(0).isNullAt(1))
  }

  test("globalRowNumber: empty partitions and empty input are safe") {
    import spark.implicits._
    val out = Relational.globalRowNumber(
      Seq((10L, "a"), (20L, "b")).toDF("k", "v"), "k", numPartitions = 8)
    assert(out.select("rn").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    val empty = Relational.globalRowNumber(
      Seq.empty[(Long, String)].toDF("k", "v"), "k", numPartitions = 4)
    assert(empty.count() == 0)
  }

  test("groupedWeightedQuantiles: hand case, unit weights ≡ unweighted, driver twin, guards") {
    import spark.implicits._
    // hand case: g=a values (1,w=1),(2,w=1),(3,w=8) → W=10, median
    // threshold ceil(5)=5 lands in the w=8 run → q0=3; p90 → 3 too.
    // g=b: (5,w=3),(7,w=1) → W=4, ceil(2)=2 → 5; p90 ceil(3.6)=4 → 7.
    val hand = Seq(("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 8L), ("b", 5L, 3L), ("b", 7L, 1L))
      .toDF("g", "v", "w")
    val got = Relational
      .groupedWeightedQuantiles(hand, "g", "v", "w", Seq(0.5, 0.9), numPartitions = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set(("a", 3L, 3L), ("b", 5L, 7L)))
    // unit weights reduce to the unweighted operator
    val rnd = new scala.util.Random(99)
    val df = (1 to 400).map(_ => (s"g${rnd.nextInt(3)}", rnd.nextInt(50).toLong)).toDF("g", "v")
    val unw = Relational
      .groupedDiscreteQuantiles(df, "g", "v", Seq(0.25, 0.5, 0.9), numPartitions = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val unitW = Relational
      .groupedWeightedQuantiles(
        df.withColumn("w", lit(1L)), "g", "v", "w", Seq(0.25, 0.5, 0.9), numPartitions = 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(unitW == unw)
    // weighted driver twin on random weights, invariant under repartitioning
    val wdf = (1 to 300).map(_ => (s"g${rnd.nextInt(2)}", rnd.nextInt(40).toLong, 1L + rnd.nextInt(9)))
      .toDF("g", "v", "w")
    val rows = wdf.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = rows.groupBy(_._1).map { case (g, rs) =>
      val sortedRs = rs.sortBy(_._2)
      val tw = rs.map(_._3).sum
      def pick(p: Double): Long = {
        val t = math.max(1L, math.ceil(tw * p).toLong)
        var cum = 0L
        sortedRs.find { r => cum += r._3; cum >= t }.get._2
      }
      (g, pick(0.5), pick(0.9))
    }.toSet
    Seq(1, 6).foreach { parts =>
      val w = Relational
        .groupedWeightedQuantiles(wdf.repartition(parts), "g", "v", "w", Seq(0.5, 0.9), numPartitions = 4)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(w == expect, s"repartition($parts)")
    }
    // zero/negative weight rejected
    val bad = Seq(("a", 1L, 0L)).toDF("g", "v", "w")
    val e = intercept[Exception] {
      Relational.groupedWeightedQuantiles(bad, "g", "v", "w", Seq(0.5), numPartitions = 2).collect()
    }
    assert(e.getMessage.contains("positive"), e.getMessage)
  }

  test("groupedDiscreteQuantiles: maxGroups guard trips on high-cardinality keys") {
    import spark.implicits._
    // 50 distinct groups against maxGroups=10: the operator's driver
    // bookkeeping is O(P·G), so a high-cardinality key must be
    // rejected loudly (the plain-agg formulation is the right tool
    // there), not absorbed into driver memory.
    val df = (1L to 200L).map(i => (i % 50, i)).toDF("g", "v")
    val e = intercept[Exception] {
      Relational
        .groupedDiscreteQuantiles(df, "g", "v", Seq(0.5), numPartitions = 4, maxGroups = 10)
        .collect()
    }
    assert(e.getMessage.contains("maxGroups"), e.getMessage)
    // The same shape under the default bound still computes.
    val ok = Relational
      .groupedDiscreteQuantiles(df, "g", "v", Seq(0.5), numPartitions = 4)
    assert(ok.count() == 50)
  }

  test("groupedDiscreteQuantiles: null value column is rejected (cross-engine rank order)") {
    import spark.implicits._
    // Spark ranks nulls FIRST, SQL oracles default NULLS LAST — a null
    // in the value column would shift per-group ranks differently per
    // engine, so the operator refuses it instead of picking a side.
    val df = Seq(("a", Some(1L)), ("a", None), ("b", Some(2L)))
      .toDF("g", "v")
    val e = intercept[Exception] {
      Relational
        .groupedDiscreteQuantiles(df, "g", "v", Seq(0.5), numPartitions = 2)
        .collect()
    }
    assert(e.getMessage.contains("null in value column"), e.getMessage)
  }
}
