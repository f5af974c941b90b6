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

/** BYTE-alphabet sibling of [[BpeTokens]] — the production form
  * (GPT-2, Radford et al. 2019): the word's UTF-8 BYTES are the base
  * symbols, so every string tokenizes (no unseen-character fallback
  * asymmetry) and multi-byte characters are billed at their true byte
  * cost — exactly where the code-point counts of `graft_bpe` drift on
  * non-ASCII and code text.
  *
  * Byte↔symbol mapping: byte b ⇒ the single code point U+0100+b
  * (Latin Extended), the same trick as GPT-2's bytes_to_unicode table
  * but with a contiguous offset both engines can compute as
  * `chr(256 + b)` — the DuckDB oracle rebuilds the identical symbol
  * stream from `hex(encode(word))` and replays the identical greedy
  * loop. Tokens are returned IN this mapped alphabet (printable,
  * hash-stable cross-engine); `mkString` of the tokens restores the
  * mapped form, and mapping each char c back to byte (c - 0x100)
  * restores the exact UTF-8 bytes.
  *
  * All symbols live at U+0100..U+01FF and merges only concatenate
  * them, so the U+0001 pair-key encoding is collision-free by
  * construction (no trainer contract needed).
  *
  * Merge table: `graft/bpe_merges_bytes.txt` (rank = line number),
  * trained by `tools/make_bpe.py --bytes` over the corpus pre-tokens
  * of [[BpeTokens.preTokenPattern]].
  */
case class BpeBytesTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_bpe_bytes requires string, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_bpe_bytes"

  override protected def nullSafeEval(a: Any): Any =
    BpeTokens.encodeBytes(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = graft.functions.BpeTokens.encodeBytes($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeTokens {

  /** Separator for pair-key encoding; trainer guarantees no merge
    * symbol contains control chars, and multi-char symbols only grow
    * from merges, so no legal key is ambiguous.
    */
  private final val Sep = '\u0001'

  /** GPT-2-style pre-tokenizer, restricted to the Java-regex ∩ RE2
    * subset so Spark's `regexp_extract_all` (idx 0) and DuckDB's
    * `regexp_extract_all` segment IDENTICALLY: contractions first,
    * then optionally-space-prefixed letter / digit / punctuation runs,
    * then whitespace runs. Two deliberate deviations from the GPT-2
    * original, both documented cross-engine hazards: the lookahead
    * `\s+(?!\S)` (RE2 has no lookahead) is dropped — a multi-space run
    * before a word becomes one whitespace token instead of donating
    * its last space to the word — and `\s` is spelled as the explicit
    * class `[ \t\n\f\r]` because Java's `\s` includes U+000B where
    * RE2's does not.
    */
  final val preTokenPattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^ \\t\\n\\f\\r\\p{L}\\p{N}]+|[ \\t\\n\\f\\r]+"

  private def loadMerges(resource: String): Array[(String, String)] = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"$resource missing from classpath")
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

  private[functions] def rankMap(ms: Array[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](ms.length * 2)
    var i = 0
    while (i < ms.length) {
      m.put(ms(i)._1 + Sep + ms(i)._2, Integer.valueOf(i))
      i += 1
    }
    m
  }

  /** (left, right) merges in rank order, from the checked-in fixtures. */
  val merges: Array[(String, String)] = loadMerges("/graft/bpe_merges.txt")
  val bytesMerges: Array[(String, String)] = loadMerges("/graft/bpe_merges_bytes.txt")

  private val ranks = rankMap(merges)
  private val bytesRanks = rankMap(bytesMerges)

  /** The greedy lowest-rank merge loop with left-to-right
    * non-overlapping replacement — the loop `tools/make_bpe.py` trains
    * with and the DuckDB oracle replays; shared by both alphabets.
    */
  private[functions] def greedy(
      syms0: java.util.ArrayList[String],
      ms: Array[(String, String)],
      rk: java.util.HashMap[String, Integer]): ArrayData = {
    var syms = syms0
    var more = syms.size > 1
    while (more) {
      var best = Int.MaxValue
      var j = 0
      while (j < syms.size - 1) {
        val r = rk.get(syms.get(j) + Sep + syms.get(j + 1))
        if (r != null && r.intValue() < best) best = r.intValue()
        j += 1
      }
      if (best == Int.MaxValue) more = false
      else {
        val l = ms(best)._1
        val r = ms(best)._2
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

  /** Row kernel (static entry for the generated Java): code-point
    * split, then the greedy merge loop over the char-alphabet table.
    */
  def encode(word: UTF8String): ArrayData =
    greedy(splitCodePoints(word), merges, ranks)

  /** Byte-alphabet row kernel: UTF-8 bytes mapped to U+0100+b symbols
    * (the chr(256+b) mapping the oracle rebuilds from hex(encode(w))),
    * then the same greedy loop over the byte-merge table. All symbols
    * sit at U+0100..U+01FF, so the Sep pair-key encoding is
    * collision-free by construction in this mode.
    */
  def encodeBytes(word: UTF8String): ArrayData =
    greedy(splitBytes(word), bytesMerges, bytesRanks)

  private[functions] def splitCodePoints(word: UTF8String): java.util.ArrayList[String] = {
    val s = word.toString
    val syms = new java.util.ArrayList[String](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val cc = Character.charCount(cp)
      syms.add(s.substring(i, i + cc))
      i += cc
    }
    syms
  }

  private[functions] def splitBytes(word: UTF8String): java.util.ArrayList[String] = {
    val bytes = word.getBytes
    val syms = new java.util.ArrayList[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      syms.add(String.valueOf((0x100 + (bytes(i) & 0xFF)).toChar))
      i += 1
    }
    syms
  }

  /** One `left<TAB>right` per line — the wire form a runtime-trained
    * merge table travels in (driver → literal → plan reference
    * object), matching the classpath fixture's format. Merge symbols
    * never contain control chars (trainer contract), so TAB/NEWLINE
    * framing is collision-free.
    */
  def mergesSpecOf(ms: Seq[(String, String)]): String =
    ms.map { case (l, r) => s"$l\t$r" }.mkString("\n")

  private[functions] def parseMergesSpec(spec: String): Array[(String, String)] =
    spec
      .split('\n')
      .iterator
      .filter(_.nonEmpty)
      .map { line =>
        val t = line.indexOf('\t')
        require(t > 0 && t < line.length - 1, s"malformed merge line: ${line.take(40)}")
        (line.substring(0, t), line.substring(t + 1))
      }
      .toArray
}

/** A RUNTIME merge table as a serializable plan reference: the greedy
  * kernel loop of [[BpeTokens]] over a caller-supplied table instead
  * of the checked-in fixture — what closes the in-engine
  * train→tokenize loop (q180): [[graft.operators.BpeTrainer]] induces
  * the merges, this codec tokenizes with them, same plan. Ships to
  * executors inside the serialized expression (NOT a driver-side
  * registry, which an executor could never see); the rank map
  * rebuilds lazily on each JVM.
  */
final class BpeCodec(val spec: String, val byteMode: Boolean) extends Serializable {
  @transient private lazy val ms: Array[(String, String)] = BpeTokens.parseMergesSpec(spec)
  @transient private lazy val rk: java.util.HashMap[String, Integer] = BpeTokens.rankMap(ms)
  def encode(word: UTF8String): ArrayData =
    BpeTokens.greedy(
      if (byteMode) BpeTokens.splitBytes(word) else BpeTokens.splitCodePoints(word),
      ms,
      rk)
}

/** `graft_bpe_table(word, mergesSpec, byteMode)` — [[BpeTokens]] /
  * [[BpeBytesTokens]] with the merge table passed as a foldable
  * literal (one `l<TAB>r` per line, rank = line order) instead of the
  * classpath fixture. Same per-row no-shuffle codegen shape as the
  * static kernels; the codec travels as a plan reference object.
  */
case class BpeTableTokens(child: Expression, spec: String, byteMode: Boolean)
    extends UnaryExpression {

  @transient private lazy val codec = new BpeCodec(spec, byteMode)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_bpe_table requires string, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_bpe_table"

  override protected def nullSafeEval(a: Any): Any =
    codec.encode(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCodec", codec, classOf[BpeCodec].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.encode($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
