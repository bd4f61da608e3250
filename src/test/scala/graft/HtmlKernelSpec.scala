package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.HtmlKernel

/** HTML → text extraction state machine: tags, raw elements, comments,
  * entities, whitespace normalization, and the null/empty contract. */
class HtmlKernelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def x(html: String): String =
    Seq(Tuple1(html)).toDF("h")
      .select(HtmlKernel.htmlToText(col("h"))).collect().head.getString(0)

  test("tags strip; block tags break lines; inline tags do not") {
    assert(x("<html><body><p>hello world</p><p>second</p></body></html>")
      === "hello world\nsecond")
    assert(x("a <b>bold</b> move") === "a bold move")
    assert(x("one<br>two") === "one\ntwo")
    assert(x("<h1>Title</h1>body <span>inline</span> text")
      === "Title\nbody inline text")
    assert(x("<ul><li>a</li><li>b</li></ul>") === "a\nb")
  }

  test("script and style drop with their content; comments drop") {
    assert(x("before<script>var x = '<p>not text</p>';</script>after")
      === "beforeafter")
    assert(x("a<style>p { color: red }</style>b") === "ab")
    assert(x("a<SCRIPT TYPE=\"text/javascript\">1 < 2</SCRIPT>b") === "ab")
    assert(x("a<!-- a comment <p>still comment</p> -->b") === "ab")
    assert(x("a<script>never closed") === "a")
    assert(x("a<!-- never closed") === "a")
    // Self-closing script has no content to skip.
    assert(x("a<script src=\"x.js\"/>b") === "ab")
  }

  test("attributes with quoted '>' do not end the tag early") {
    assert(x("""<a href="u?x>y" title='a>b'>link</a>""") === "link")
  }

  test("entities decode; unknown and unterminated stay literal") {
    assert(x("a &amp; b &lt;tag&gt; &quot;q&quot; &apos;s&apos;")
      === "a & b <tag> \"q\" 's'")
    assert(x("x&nbsp;y") === "x y")
    assert(x("&#65;&#x42;&#x63;") === "ABc")
    assert(x("tom &jerry") === "tom &jerry")
    assert(x("a &unknownent; b") === "a &unknownent; b")
    assert(x("end &") === "end &")
    // Out-of-range / surrogate numerics drop.
    assert(x("a&#xD800;b&#1114112;c") === "abc")
  }

  test("whitespace normalizes: runs collapse, newline wins, ends trim") {
    assert(x("  hello   world  ") === "hello world")
    assert(x("<p>  a  </p>\n\n<p>  b  </p>") === "a\nb")
    assert(x("a \t b") === "a b")
    assert(x("a \n b") === "a\nb")
    assert(x("<p></p><p></p>text<p></p>") === "text")
  }

  test("stray '<' that opens no tag is literal text") {
    assert(x("1 < 2 and 3 > 2") === "1 < 2 and 3 > 2")
  }

  test("null -> null; empty and markup-only -> empty string") {
    val r = Seq(Tuple1(null: String)).toDF("h")
      .select(HtmlKernel.htmlToText(col("h"))).collect().head
    assert(r.isNullAt(0))
    assert(x("") === "")
    assert(x("<html><head><style>a{}</style></head><body></body></html>") === "")
  }

  test("multibyte text passes through intact") {
    assert(x("<p>施氏食獅史</p><p>émoji 🙂 done</p>")
      === "施氏食獅史\némoji 🙂 done")
  }
}
