package graft.core

import java.nio.file.{Files, Paths, Path}
import java.nio.charset.StandardCharsets.UTF_8

/** Writes the golden fixture files (NN.html + NN.nodes + NN.txt) under
  * src/test/resources/fixtures — FIXTURES.md §4/§5. Run once after the
  * hand-computed ScannerSpec/ExtractorSpec expectations are green, so the
  * goldens pin the reviewed semantics as regression anchors.
  *
  *   sbt "Test/runMain graft.core.FixtureGen"
  */
object FixtureGen {

  val cases: Seq[(String, String)] = Seq(
    "01" -> "<p>Hello <b>world</b>!</p>",
    "02" -> """<a href="x.htm" title='t' data-k=v checked>y</a>""",
    "03" -> "<br/> <img src=a.png />",
    "04a" -> "a<!-- hi -->b",
    "04b" -> "a<!-- hi",
    "05" -> "<![CDATA[ x < y && z ]]>",
    "06" -> """<script>if(a<b){d.write("<p>no</p>")}</script>""",
    "07" -> "<style>a>b{color:red}</style>",
    "08a" -> "<p <b>x",
    "08b" -> "< notatag",
    "08c" -> "<>",
    "08d" -> """<a href=">y""",
    "09" -> "<!DOCTYPE html><?xml v?>",
    "10" -> "<div><p>a<div>b",
    "11" -> "<averyveryverylongtagname attr=1>",
    "12" -> "<SCRIPT>x</ScRiPt><A HREF=1></A>",
    "13" -> "<p>a &lt;b&gt; &amp;&quot; &nbsp; &#65;&#x42; &unknown;</p>",
    "14" -> "<p>你好 🙂</p>",
    "15a" -> "<",
    "15b" -> "a",
    "15c" -> " \n ",
    // extraction-focused (E-01/E-02 shapes)
    "20" -> ("<html><head><title>T</title></head><body>" +
      "<nav><a href=1>Home</a> <a href=2>About</a></nav>" +
      "<article><p>Real content &amp; more.</p>" +
      "<p>Second para with <a href=q>one link</a> inside lots of words.</p>" +
      "</article><footer><a href=3>Contact</a></footer></body></html>"),
    "21" -> "<body><script>var a=1;</script><style>p{}</style><p>keep</p></body>",
    // adversarial additions (round 1): raw-text, attr, close-tag edge zoo
    "22" -> """<script>document.write("<script>x</script>")</script>trail""",
    "23" -> """<input value = "a b" disabled data-x=' q ' empty="" weird=a"b c>""",
    "24" -> "</div>a</p><b>b</b></b>",
    "25" -> "<style>a</styleX>b</style >c",
    "26" -> "a<!-- -- -->b<!---->c",
    "27" -> "<![CDATA[abc",
    "28" -> "<script src=x />after",
    "29" -> "<p>&#0; &#x110000; &#xD800; &lt</p>",
    "30" -> "<p><a href=x>12345</a>67890</p><p><a href=y>123456</a>7890</p>"
  )

  def main(args: Array[String]): Unit = {
    val dir: Path = Paths.get("src/test/resources/fixtures")
    Files.createDirectories(dir)
    cases.foreach { case (id, html) =>
      val bytes = html.getBytes(UTF_8)
      val nodes = HtmlScanner.parse(bytes)
      val extracted = Extractor.extract(nodes)
      Files.write(dir.resolve(s"$id.html"), bytes)
      Files.write(dir.resolve(s"$id.nodes"), HNode.dump(nodes).getBytes(UTF_8))
      Files.write(dir.resolve(s"$id.txt"), extracted.text.getBytes(UTF_8))
    }
    println(s"wrote ${cases.size} fixtures to $dir")
  }
}
