package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: REAL byte-pair-encoding tokenization of
  * one word under the library's checked-in merge table — the exact
  * token counter a training-data pipeline budgets by, replacing the
  * whitespace/regex PROXY counts (q28) wherever true tokenizer counts
  * matter (corpus token budgets, packing, DSIR-style reweighting).
  *
  * Algorithm (public: Sennrich et al. 2016; the GPT-2 merge-rank form,
  * Radford et al. 2019): split the word into Unicode CODE POINTS, then
  * repeatedly find the adjacent symbol pair with the LOWEST merge rank
  * and replace its occurrences in one left-to-right non-overlapping
  * pass, until no adjacent pair is in the table. Character alphabet,
  * not GPT-2's byte alphabet — a deliberate fixture decision so the
  * DuckDB oracle can replay the identical loop with `string_split(w,'')`
  * (code-point granularity on both engines, verified for astral and
  * combining characters); symbols unseen in training stay single
  * tokens, the standard fallback.
  *
  * The merge table ships as a resource (`graft/bpe_merges.txt`, one
  * `left<TAB>right` per line, rank = line number) trained by
  * `tools/make_bpe.py` with the same fold semantics. Merges never
  * contain control characters (trainer contract), so the U+0001 pair-key
  * encoding below is collision-free.
  *
  * Scale shape: per-row kernel, no shuffle, stays inside whole-stage
  * codegen (static call, like the other seven graft kernels). Intended
  * use at 100 TB is over the DISTINCT-word universe with a broadcast
  * join back — vocabulary ≪ corpus — not per-document re-encoding.
  */
case class BpeTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_bpe requires string, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_bpe"

  override protected def nullSafeEval(a: Any): Any =
    BpeTokens.encode(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = graft.functions.BpeTokens.encode($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeTokens {

  /** Separator for pair-key encoding; trainer guarantees no merge
    * symbol contains control chars, and multi-char symbols only grow
    * from merges, so no legal key is ambiguous.
    */
  private final val Sep = '\u0001'

  /** (left, right) merges in rank order, from the checked-in fixture. */
  val merges: Array[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "graft/bpe_merges.txt missing from classpath")
    try {
      scala.io.Source
        .fromInputStream(in, "UTF-8")
        .getLines()
        .filter(_.nonEmpty)
        .map { line =>
          val t = line.indexOf('\t')
          require(t > 0 && t < line.length - 1, s"malformed merge line: ${line.take(40)}")
          (line.substring(0, t), line.substring(t + 1))
        }
        .toArray
    } finally in.close()
  }

  private val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      m.put(merges(i)._1 + Sep + merges(i)._2, Integer.valueOf(i))
      i += 1
    }
    m
  }

  /** Row kernel (static entry for the generated Java): code-point
    * split, then the greedy lowest-rank merge loop with left-to-right
    * non-overlapping replacement — the loop `tools/make_bpe.py` trains
    * with and the DuckDB oracle replays.
    */
  def encode(word: UTF8String): ArrayData = {
    val s = word.toString
    var syms = new java.util.ArrayList[String](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val cc = Character.charCount(cp)
      syms.add(s.substring(i, i + cc))
      i += cc
    }
    var more = syms.size > 1
    while (more) {
      var best = Int.MaxValue
      var j = 0
      while (j < syms.size - 1) {
        val rk = ranks.get(syms.get(j) + Sep + syms.get(j + 1))
        if (rk != null && rk.intValue() < best) best = rk.intValue()
        j += 1
      }
      if (best == Int.MaxValue) more = false
      else {
        val l = merges(best)._1
        val r = merges(best)._2
        val out = new java.util.ArrayList[String](syms.size)
        var k = 0
        while (k < syms.size) {
          if (k + 1 < syms.size && syms.get(k) == l && syms.get(k + 1) == r) {
            out.add(l + r)
            k += 2
          } else {
            out.add(syms.get(k))
            k += 1
          }
        }
        syms = out
        more = syms.size > 1
      }
    }
    val arr = new Array[Any](syms.size)
    var a = 0
    while (a < syms.size) {
      arr(a) = UTF8String.fromString(syms.get(a))
      a += 1
    }
    new GenericArrayData(arr)
  }
}
