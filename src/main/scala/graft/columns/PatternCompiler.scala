package graft.columns

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.seed.Seeds
import graft.spec.SpecError

/** Compiles `"ORD-{digit:4}-{alpha:3}"`-style placeholder patterns into a
  * single `concat(...)` of built-in expressions — every placeholder is a
  * deterministic function of (columnSeed, rowId, position).
  *
  * Placeholders (semantics per dbldatagen/core/engine/columns/string.py:70-246):
  *   {seq}      — row id + 1 as text; {seq:N} zero-pads to width N (N<=24)
  *   {uuid}     — deterministic uuid-shaped string
  *   {digit:N}  — N decimal digits, zero-padded (N<=18)
  *   {alpha:N}  — N uppercase letters, each an independent hash pick (N<=64)
  *   {hex:N}    — N lowercase hex digits (N<=15)
  * Width caps keep pmod moduli within exact Long range.
  */
object PatternCompiler {

  sealed trait Token
  final case class Literal(s: String) extends Token
  final case class Digit(n: Int) extends Token
  final case class Alpha(n: Int) extends Token
  final case class Hex(n: Int) extends Token
  final case class Seq_(pad: Option[Int]) extends Token
  case object UuidTok extends Token

  private val Placeholder = raw"\{(seq|uuid|digit|alpha|hex)(?::(\d+))?\}".r

  def tokenize(pattern: String): List[Token] = {
    val out = List.newBuilder[Token]
    var last = 0
    for (m <- Placeholder.findAllMatchIn(pattern)) {
      if (m.start > last) out += Literal(pattern.substring(last, m.start))
      val width = Option(m.group(2)).map(_.toInt)
      m.group(1) match {
        case "seq" =>
          width.foreach(w => require(w >= 1 && w <= 24, s"{seq:$w} width must be 1..24"))
          out += Seq_(width)
        case "uuid" => out += UuidTok
        case "digit" =>
          val w = width.getOrElse(throw SpecError(s"{digit} needs a width in '$pattern'"))
          require(w >= 1 && w <= 18, s"{digit:$w} width must be 1..18"); out += Digit(w)
        case "alpha" =>
          val w = width.getOrElse(throw SpecError(s"{alpha} needs a width in '$pattern'"))
          require(w >= 1 && w <= 64, s"{alpha:$w} width must be 1..64"); out += Alpha(w)
        case "hex" =>
          val w = width.getOrElse(throw SpecError(s"{hex} needs a width in '$pattern'"))
          require(w >= 1 && w <= 15, s"{hex:$w} width must be 1..15"); out += Hex(w)
      }
      last = m.end
    }
    if (last < pattern.length) out += Literal(pattern.substring(last))
    out.result()
  }

  def compile(pattern: String, columnSeed: Long, id: Column): Column = {
    val parts = tokenize(pattern).zipWithIndex.map { case (tok, k) =>
      val tokSeed = Seeds.subSeed(columnSeed, k)
      tok match {
        case Literal(s) => lit(s)
        case Seq_(None) => (id + lit(1L)).cast("string")
        case Seq_(Some(w)) => lpad((id + lit(1L)).cast("string"), w, "0")
        case UuidTok => ColumnCompiler.uuidColumn(tokSeed, id)
        case Digit(w) =>
          val m = math.pow(10, w).toLong
          lpad(pmod(Seeds.cellSeed(tokSeed, id), lit(m)).cast("string"), w, "0")
        case Hex(w) =>
          val m = 1L << (4 * w)
          lower(lpad(hex(pmod(Seeds.cellSeed(tokSeed, id), lit(m))), w, "0"))
        case Alpha(w) =>
          // Grouped table lookups: one hash drives three chars (inline
          // per-char hashing costs ~3KB of generated Java per char).
          CharTables.run("ABCDEFGHIJKLMNOPQRSTUVWXYZ", w, tokSeed, id)
      }
    }
    if (parts.length == 1) parts.head else concat(parts: _*)
  }

  private def substringPick(zeroBasedIdx: Column): Column =
    lit("ABCDEFGHIJKLMNOPQRSTUVWXYZ").substr(zeroBasedIdx + lit(1), lit(1))
}
