package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Prefix-filter selectivity probe: runs the EXACT set-similarity
  * join ([[Dedup.prefixFilterSimilarityJoin]]) UNSLICED over a
  * document corpus and reports candidates-vs-all-pairs — the at-scale
  * evidence that rare-token prefix pruning works on a realistic
  * (Zipf-shaped) vocabulary, which the driver fixture's ~30-word
  * vocabulary cannot show (there, every token is common and the
  * candidate set degenerates to near-all-pairs by construction).
  *
  * Pair with `tools/make_zipf.py`:
  * {{{
  * python3 tools/make_zipf.py /tmp/zipfdata --docs=5000
  * tools/run_main.sh graft.SimJoinProbe --dir=/tmp/zipfdata --t-num=7 --t-den=10
  * }}}
  */
object SimJoinProbe {
  def main(args: Array[String]): Unit = {
    val cfg = Config(args)
    val dir = cfg.get("dir", "SPARK_GRAFT_SIMJOIN_DIR", "/tmp/zipfdata")
    val cpus = cfg.get("cpus", "SPARK_GRAFT_CPUS", "32").toInt
    val tNum = cfg.get("t-num", "SPARK_GRAFT_T_NUM", "7").toInt
    val tDen = cfg.get("t-den", "SPARK_GRAFT_T_DEN", "10").toInt
    val nDocs = cfg.get("docs", "SPARK_GRAFT_SCALE_DOCS", "0").toLong // 0 = all
    val spark = GraftSession.local(cpus, appName = "graft-simjoin-probe")
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.documents(spark, dir).filter(col("text").isNotNull)
    val docs = (if (nDocs > 0) base.filter(col("doc_id") < nDocs) else base)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
    val t0 = System.nanoTime()
    val (n, allPairs, cands, verified) =
      Dedup.prefixFilterSelectivity(docs, "doc_id", "toks", tNum, tDen)
    val dt = (System.nanoTime() - t0) / 1e9
    val pct = if (allPairs > 0) 100.0 * cands / allPairs else 0.0
    println(
      f"""{"probe":"simjoin_selectivity","dir":"$dir","docs":$n,"all_pairs":$allPairs,"candidates":$cands,"cand_pct":$pct%.3f,"verified":$verified,"t":$tNum/$tDen,"sec":$dt%.2f}""")
    spark.stop()
  }
}
