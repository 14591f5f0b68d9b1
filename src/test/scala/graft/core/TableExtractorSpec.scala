package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** Table extraction coverage: well-formed grids, the implicit-close rules
  * sloppy real-world markup depends on (no `</td>`/`</tr>`), wrappers,
  * colspan, nested tables, entity decoding, and never-throws fuzz.
  */
class TableExtractorSpec extends AnyFunSuite {

  private def cells(html: String): Seq[TableExtractor.Cell] =
    TableExtractor.cells(HtmlScanner.parse(html.getBytes(UTF_8))).toSeq

  test("well-formed table with thead/tbody wrappers and th headers") {
    val h =
      """<table><thead><tr><th>K</th><th>V</th></tr></thead>
        |<tbody><tr><td>a</td><td>1</td></tr>
        |<tr><td>b</td><td>2</td></tr></tbody></table>""".stripMargin
    assert(cells(h) === Seq(
      TableExtractor.Cell(0, 0, 0, header = true, "K"),
      TableExtractor.Cell(0, 0, 1, header = true, "V"),
      TableExtractor.Cell(0, 1, 0, header = false, "a"),
      TableExtractor.Cell(0, 1, 1, header = false, "1"),
      TableExtractor.Cell(0, 2, 0, header = false, "b"),
      TableExtractor.Cell(0, 2, 1, header = false, "2")))
  }

  test("implicit closes: no </td>, no </tr> — the sloppy-markup norm") {
    val h = "<table><tr><td>a<td>b<tr><td>c<td>d</table>"
    assert(cells(h) === Seq(
      TableExtractor.Cell(0, 0, 0, header = false, "a"),
      TableExtractor.Cell(0, 0, 1, header = false, "b"),
      TableExtractor.Cell(0, 1, 0, header = false, "c"),
      TableExtractor.Cell(0, 1, 1, header = false, "d")))
  }

  test("colspan advances the column cursor; junk colspan ignored") {
    val h = """<table><tr><td colspan=2>wide</td><td>x</td></tr>
              |<tr><td colspan="zero">j</td><td>y</td></tr></table>""".stripMargin
    assert(cells(h) === Seq(
      TableExtractor.Cell(0, 0, 0, header = false, "wide"),
      TableExtractor.Cell(0, 0, 2, header = false, "x"),
      TableExtractor.Cell(0, 1, 0, header = false, "j"),
      TableExtractor.Cell(0, 1, 1, header = false, "y")))
  }

  test("nested table: own grid AND its text inside the outer cell") {
    val h = "<table><tr><td>out <table><tr><td>in</td></tr></table> er</td></tr></table>"
    val cs = cells(h)
    // inner table flushes first (its </table> precedes the outer cell close)
    assert(cs === Seq(
      TableExtractor.Cell(1, 0, 0, header = false, "in"),
      TableExtractor.Cell(0, 0, 0, header = false, "out in er")))
  }

  test("entities, inline markup, cell at EOF, text outside any table") {
    val h = "pre <table><tr><td>T &amp;&nbsp;<b>bold</b></td><tr><th>open"
    assert(cells(h) === Seq(
      TableExtractor.Cell(0, 0, 0, header = false, "T & bold"),
      TableExtractor.Cell(0, 1, 0, header = true, "open")))
    assert(cells("no tables here").isEmpty)
    // td outside a table is ignored; td before any tr gets implicit row 0
    assert(cells("<td>stray</td>").isEmpty)
    assert(cells("<table><td>x</td></table>") ===
      Seq(TableExtractor.Cell(0, 0, 0, header = false, "x")))
  }

  test("never throws on garbage and truncation") {
    val rnd = new scala.util.Random(11)
    (0 until 300).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(b)
      TableExtractor.cells(HtmlScanner.parse(b))
    }
    val base = "<table><tr><td colspan=3>a<td>b<tr><th>c</table>x<table><tr><td>d"
    (0 to base.length).foreach { k =>
      cells(base.take(k)) // no throw
    }
  }
}
