package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

class MarkdownExtractorSpec extends AnyFunSuite {

  private def md(html: String): String =
    MarkdownExtractor.markdown(html.getBytes(UTF_8))

  test("headings, paragraphs, emphasis") {
    val got = md(
      """<h1>Title</h1><p>Plain <b>bold</b> and <em>ital</em> text.</p>
        |<h2>Sub</h2><p>Second para.</p>""".stripMargin)
    assert(got ===
      """# Title
        |
        |Plain **bold** and *ital* text.
        |
        |## Sub
        |
        |Second para.""".stripMargin)
  }

  test("links, images, fragment-only links flattened") {
    val got = md(
      """<p>See <a href="/docs?a=1&amp;b=2">the docs</a> or <a href="#top">top</a>.
        |<img src="/x.png" alt="pic"></p>""".stripMargin)
    assert(got ===
      """See [the docs](/docs?a=1&b=2) or top. ![pic](/x.png)""")
  }

  test("nested and ordered lists") {
    val got = md(
      """<ul><li>one</li><li>two<ul><li>deep</li></ul></li></ul>
        |<ol><li>first</li><li>second</li></ol>""".stripMargin)
    assert(got ===
      """- one
        |- two
        |  - deep
        |
        |1. first
        |2. second""".stripMargin)
  }

  test("blockquote and horizontal rule") {
    val got = md("""<blockquote><p>quoted line</p></blockquote><hr><p>after</p>""")
    assert(got ===
      """> quoted line
        |
        |---
        |
        |after""".stripMargin)
  }

  test("pre blocks keep raw text unescaped; inline code backticked") {
    val got = md(
      "<p>Use <code>a*b</code> here.</p><pre>if (x &lt; 2) {\n  y[0] = *p;\n}</pre>")
    assert(got ===
      """Use `a*b` here.
        |
        |```
        |if (x < 2) {
        |  y[0] = *p;
        |}
        |```""".stripMargin)
  }

  test("markdown metacharacters in text are escaped outside code") {
    val got = md("<p>2*3 a_b [x] c\\d</p>")
    assert(got === """2\*3 a\_b \[x\] c\\d""")
  }

  test("destinations with parens/spaces use the <...> form; alt text escaped") {
    val got = md("""<p><a href="/w(x)/y z">l</a> <img src="/i (1).png" alt="a]b"></p>""")
    assert(got === """[l](</w(x)/y z>) ![a\]b](</i (1).png>)""")
  }

  test("boilerplate subtrees dropped (same policy as text extraction)") {
    val got = md(
      """<head><title>t</title></head><nav><a href="/x">nav</a></nav>
        |<p>kept</p><footer>legal</footer><script>var a='<p>no</p>'</script>""".stripMargin)
    assert(got === "kept")
  }

  test("unclosed elements and damaged input never throw; binary fuzz") {
    assert(md("<b>dangling <i>nested") === "**dangling *nested***")
    assert(md("") === "")
    val rnd = new scala.util.Random(53)
    (0 until 200).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(4096))
      rnd.nextBytes(b)
      MarkdownExtractor.markdown(b) // no throw
    }
  }

  test("full synthesized page: structure present, no raw tags leak") {
    val html = graft.sources.PagesSynth.htmlFor(7L)
    val got = MarkdownExtractor.markdown(html.getBytes(UTF_8))
    assert(got.contains("# ")) // the h1
    assert(!got.contains("<p>") && !got.contains("<div") && !got.contains("<a "))
    assert(got.contains("](«/ref/".replace("«", "")) || got.contains("](/ref/"))
  }
}
