package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel: repair WHOLE-DOCUMENT double-encoded mojibake — the
  * core fix of ftfy (Speer, "fixes text for you": UTF-8 bytes that
  * were mis-decoded as latin-1/Windows-1252 and re-encoded). The
  * inverse walk maps every character back to the byte it mis-decoded
  * from — code points ≤ 0xFF directly (latin-1), the 27 printable
  * Windows-1252 images of 0x80–0x9F through the CP-1252 table — and
  * re-decodes the reconstructed byte stream as UTF-8.
  *
  * The kernel itself is TOTAL: callers gate it behind the
  * [[graft.operators.TextAnalysis.MojibakeEligiblePat]] eligibility
  * regex (ASCII + COMPLETE mojibake sequences only), which guarantees
  * the reconstructed bytes are well-formed UTF-8, so the oracle's
  * `decode(unhex(...))` replay cannot throw and both engines repair
  * the identical document set. On a character that maps to no byte
  * (legit CJK, emoji — an ineligible document) the kernel returns the
  * input UNCHANGED, as does a reconstructed stream that is not valid
  * UTF-8 (defense in depth; unreachable behind the gate).
  *
  * Scale shape: per-row, no shuffle, whole-stage codegen (static
  * call) — the 11th graft kernel.
  */
case class FixMojibake(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_fix_mojibake requires string, got $t")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_fix_mojibake"

  override protected def nullSafeEval(a: Any): Any =
    FixMojibake.repair(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = graft.functions.FixMojibake.repair($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FixMojibake {

  /** Windows-1252 images of bytes 0x80–0x9F, indexed by byte − 0x80.
    * Unmapped bytes (0x81 8D 8F 90 9D) hold U+0001 sentinels — no
    * legal input contains them (they are not printable CP-1252), so
    * the inverse lookup never hits a sentinel spuriously.
    */
  final val Cp1252Images: String = {
    val a = new Array[Char](32)
    val m = Map(
      0x80 -> 0x20AC, 0x82 -> 0x201A, 0x83 -> 0x0192, 0x84 -> 0x201E,
      0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021, 0x88 -> 0x02C6,
      0x89 -> 0x2030, 0x8A -> 0x0160, 0x8B -> 0x2039, 0x8C -> 0x0152,
      0x8E -> 0x017D, 0x91 -> 0x2018, 0x92 -> 0x2019, 0x93 -> 0x201C,
      0x94 -> 0x201D, 0x95 -> 0x2022, 0x96 -> 0x2013, 0x97 -> 0x2014,
      0x98 -> 0x02DC, 0x99 -> 0x2122, 0x9A -> 0x0161, 0x9B -> 0x203A,
      0x9C -> 0x0153, 0x9E -> 0x017E, 0x9F -> 0x0178)
    (0x80 to 0x9F).foreach(b => a(b - 0x80) = m.getOrElse(b, 0x0001).toChar)
    new String(a)
  }

  /** char → mis-decoded byte, or -1 if the char maps to no byte. */
  private def byteOf(c: Char): Int =
    if (c <= 0xFF) c.toInt
    else {
      val i = Cp1252Images.indexOf(c)
      if (i >= 0) 0x80 + i else -1
    }

  def repair(text: UTF8String): UTF8String = {
    val s = text.toString
    val bytes = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val b = byteOf(s.charAt(i))
      if (b < 0) return text // unmappable char: not whole-doc mojibake
      bytes(i) = b.toByte
      i += 1
    }
    // defense in depth: only accept a stream that decodes as strict
    // UTF-8 (behind the eligibility gate this always holds)
    val dec = java.nio.charset.StandardCharsets.UTF_8
      .newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try UTF8String.fromString(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
    catch { case _: java.nio.charset.CharacterCodingException => text }
  }
}
