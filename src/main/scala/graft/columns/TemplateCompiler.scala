package graft.columns

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.seed.Seeds

/** Legacy char-class template engine, compiled to pure Column expressions
  * (the reference implements this as a 550-line numpy masked-array pandas
  * UDF — dbldatagen/text_generators.py:413-960; token semantics :431-501).
  *
  * Tokens (default mode, `escapeSpecialChars = false`):
  *   a/A  lower/upper letter        x/X  lower/upper hex digit
  *   d    digit 0-9                 D    non-zero digit 1-9
  *   k    lower alphanumeric        K    upper alphanumeric
  *   \n   integer 0..255 (variable width)   \N  integer 0..65535
  *   \w   lower word from word list         \W  upper word
  *   \v   entire base value                 \v0..\v9  array element i
  *   \V   entire base value
  *   |    alternation (one alternative picked per row); \| literal pipe
  *   \c   for any other c: literal c
  * With `escapeSpecialChars = true` the eight class letters are literal
  * unless escaped (`\d` etc.); always-escaped tokens are unchanged.
  */
object TemplateCompiler {

  sealed trait Tok
  final case class Lit(s: String) extends Tok
  final case class Charset(chars: String) extends Tok
  final case class IntTok(max: Long) extends Tok
  final case class Word(upper: Boolean) extends Tok
  final case class BaseVal(index: Option[Int]) extends Tok

  val DefaultWords: Seq[String] = ILTextCompiler.LoremWords

  private val classes = Map(
    'a' -> "abcdefghijklmnopqrstuvwxyz",
    'A' -> "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
    'x' -> "0123456789abcdef",
    'X' -> "0123456789ABCDEF",
    'd' -> "0123456789",
    'D' -> "123456789",
    'k' -> "abcdefghijklmnopqrstuvwxyz0123456789",
    'K' -> "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789")

  /** Split template into alternatives on unescaped `|`, then tokenize each. */
  def parse(template: String, escapeSpecialChars: Boolean): Seq[List[Tok]] = {
    val alts = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    while (i < template.length) {
      val c = template.charAt(i)
      if (c == '\\' && i + 1 < template.length) { cur.append(c).append(template.charAt(i + 1)); i += 2 }
      else if (c == '|') { alts += cur.toString(); cur.clear(); i += 1 }
      else { cur.append(c); i += 1 }
    }
    alts += cur.toString()
    alts.toList.map(tokenize(_, escapeSpecialChars))
  }

  private def tokenize(alt: String, escapeMode: Boolean): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    def literal(s: String): Unit = out.lastOption match {
      case Some(Lit(p)) => out.update(out.length - 1, Lit(p + s))
      case _ => out += Lit(s)
    }
    var i = 0
    while (i < alt.length) {
      val c = alt.charAt(i)
      if (c == '\\' && i + 1 < alt.length) {
        val e = alt.charAt(i + 1)
        i += 2
        e match {
          case 'n' => out += IntTok(255L)
          case 'N' => out += IntTok(65535L)
          case 'w' => out += Word(upper = false)
          case 'W' => out += Word(upper = true)
          case 'V' => out += BaseVal(None)
          case 'v' =>
            if (i < alt.length && alt.charAt(i).isDigit) { out += BaseVal(Some(alt.charAt(i) - '0')); i += 1 }
            else out += BaseVal(None)
          case other =>
            // In escape mode, escaping a class letter activates it; in
            // default mode, escaping makes it literal.
            if (escapeMode && classes.contains(other)) out += Charset(classes(other))
            else literal(other.toString)
        }
      } else {
        if (!escapeMode && classes.contains(c)) out += Charset(classes(c))
        else literal(c.toString)
        i += 1
      }
    }
    out.toList
  }

  /** @param baseElements when the base is a known column list (raw-values
    *   seeding), `\v0..\v9` index these columns DIRECTLY — skipping the
    *   CreateArray + element_at construction, which both generates less
    *   code and dodges a janino compile failure ("not an rvalue") that the
    *   array form triggers inside wide projections. */
  def compile(template: String, escapeSpecialChars: Boolean, wordList: Seq[String],
      columnSeed: Long, id: Column, baseValue: Option[Column],
      baseElements: Option[Seq[Column]] = None): Column = {
    val words = if (wordList.nonEmpty) wordList else DefaultWords
    val alts = parse(template, escapeSpecialChars)
    // `\v0`..`\v9` index into an ARRAY base value (text_generators.py:431-501);
    // without an explicit baseColumn the base degrades to the row id, which
    // is not indexable — reject early with a spec error instead of letting
    // element_at(string, i) throw an AnalysisException at build time.
    if (baseValue.isEmpty && baseElements.isEmpty && alts.exists(_.exists {
        case BaseVal(Some(_)) => true; case _ => false }))
      throw graft.spec.SpecError(
        s"template '$template' uses indexed base-value tokens (\\v0..\\v9) but no " +
        "baseColumn is set; set ColumnStrategy.Template(baseColumn = Some(<array column>))")
    val compiled = alts.zipWithIndex.map { case (toks, altIdx) =>
      compileAlt(toks, words, Seeds.subSeed(columnSeed, 1000 + altIdx), id, baseValue,
        baseElements)
    }
    if (compiled.length == 1) compiled.head
    else {
      val pick = pmod(Seeds.cellSeed(columnSeed ^ 0x51AB5EEDL, id), lit(compiled.length.toLong))
      compiled.init.zipWithIndex.foldRight(compiled.last) { case ((c, i), rest) =>
        when(pick === lit(i.toLong), c).otherwise(rest)
      }
    }
  }

  /** Adjacent same-charset tokens merged into one run (codegen: one hash
    * can drive a whole run of digits/hex chars). */
  private final case class Run(chars: String, n: Int) extends Tok

  private def mergeRuns(toks: List[Tok]): List[Tok] = toks.foldRight(List.empty[Tok]) {
    case (Charset(cs), Run(cs2, n) :: rest) if cs == cs2 => Run(cs, n + 1) :: rest
    case (Charset(cs), rest) => Run(cs, 1) :: rest
    case (t, rest) => t :: rest
  }

  private def compileAlt(toks: List[Tok], words: Seq[String], altSeed: Long, id: Column,
      baseValue: Option[Column], baseElements: Option[Seq[Column]] = None): Column = {
    lazy val base = baseValue.getOrElse(id.cast("string"))
    val parts = mergeRuns(toks).zipWithIndex.map { case (tok, k) =>
      val tokSeed = Seeds.subSeed(altSeed, k)
      tok match {
        case Lit(s) => lit(s)
        case Run(cs, n) => runColumn(cs, n, tokSeed, id)
        // defensive: mergeRuns folds every Charset into a Run; this arm only
        // keeps the match exhaustive over the public Tok hierarchy
        case Charset(cs) => runColumn(cs, 1, tokSeed, id)
        case IntTok(max) =>
          pmod(Seeds.cellSeed(tokSeed, id), lit(max + 1)).cast("string")
        case Word(upper) =>
          val idx = pmod(Seeds.cellSeed(tokSeed, id), lit(words.length.toLong)).cast(IntegerType)
          val w = element_at(typedLit(words), idx + lit(1))
          if (upper) org.apache.spark.sql.functions.upper(w) else w
        case BaseVal(None) => base.cast("string")
        case BaseVal(Some(i)) => baseElements match {
          // direct column indexing (out-of-range -> null, matching
          // element_at's null semantics on short arrays)
          case Some(es) => if (i < es.length) es(i).cast("string") else lit(null).cast("string")
          case None => element_at(base, i + 1).cast("string")
        }
      }
    }
    parts match {
      case Nil => lit("")
      case one :: Nil => one.cast("string")
      case many => concat(many: _*)
    }
  }

  /** A run of `n` chars from one charset. Decimal and hex runs derive whole
    * groups from a single hash (`lpad(pmod(h, L^g))` — one expression per
    * up-to-18/15-char group); other charsets pick each char with its own
    * two-argument hash. Keeps generated code small: the naive
    * one-xxhash64-per-char form costs ~3KB of Java per char and overflows
    * the 64KB whole-stage-codegen method limit on wide tables. */
  private def runColumn(cs: String, n: Int, runSeed: Long, id: Column): Column = {
    def grouped(groupMax: Int)(one: (Long, Int) => Column): Column = {
      val groups = (0 until n).grouped(groupMax).zipWithIndex.map { case (g, gi) =>
        one(Seeds.subSeed(runSeed, gi), g.size)
      }.toSeq
      if (groups.length == 1) groups.head else concat(groups: _*)
    }
    cs match {
      case "0123456789" =>
        grouped(18) { (s, g) =>
          lpad(pmod(Seeds.cellSeed(s, id), lit(math.pow(10, g).toLong)).cast("string"), g, "0")
        }
      case "0123456789abcdef" =>
        grouped(15) { (s, g) =>
          lower(lpad(hex(pmod(Seeds.cellSeed(s, id), lit(1L << (4 * g)))), g, "0"))
        }
      case "0123456789ABCDEF" =>
        grouped(15) { (s, g) =>
          lpad(hex(pmod(Seeds.cellSeed(s, id), lit(1L << (4 * g)))), g, "0")
        }
      case _ => CharTables.run(cs, n, runSeed, id)
    }
  }
}
