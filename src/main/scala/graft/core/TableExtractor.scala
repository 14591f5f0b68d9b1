package graft.core

import scala.collection.mutable.ArrayBuffer

/** HTML table → cell-grid extraction in ONE scanner pass — the structured
  * side of web data a training-data pipeline mines (infoboxes, spec
  * sheets, statistics). Unlike [[Selector]]'s generic tolerant tree, this
  * implements the table-specific implicit-close rules real markup
  * depends on (WHATWG §13.2.6.4.9-13 tree-construction, reduced to the
  * table scope): a new `<tr>` closes any open cell and row, a new
  * `<td>`/`<th>` closes any open cell, `</table>` closes everything in
  * its table, and tables nest via a stack (a nested table's text also
  * belongs to the outer cell, DOM-textContent-style). `thead`/`tbody`/
  * `tfoot`/`colgroup` wrappers are transparent. `colspan` advances the
  * column cursor; cells keep their (row, col) grid position.
  *
  * Cell text is entity-decoded and whitespace-collapsed (the same
  * normalization as `extract_title`/[[Selector.innerText]]). Never throws
  * on malformed input; cells left open at EOF flush with what they have.
  *
  * Scale shape: linear per document, constant state per open table,
  * runs inside the same narrow per-partition pass as every other scanner
  * consumer; emitted rows are fixed-width (the blob never travels).
  */
object TableExtractor {

  /** One extracted cell. `table` numbers `<table>` elements in document
    * order (nested tables get their own number), `row`/`col` are 0-based
    * grid coordinates (col advances by colspan), `header` = `<th>`.
    */
  final case class Cell(table: Int, row: Int, col: Int, header: Boolean,
                        text: String)

  private final class Tbl(val idx: Int) {
    var row: Int = -1
    var col: Int = 0
    var inCell: Boolean = false
    var cellRow: Int = 0
    var cellCol: Int = 0
    var cellHeader: Boolean = false
    var cellSpan: Int = 1
    val buf = new java.lang.StringBuilder()
  }

  /** All cells of all tables in the node array, document order. */
  def cells(nodes: Array[HNode]): Array[Cell] = {
    val out = ArrayBuffer.empty[Cell]
    val stack = ArrayBuffer.empty[Tbl]
    var nextTable = 0

    def closeCell(t: Tbl): Unit = if (t.inCell) {
      out += Cell(t.idx, t.cellRow, t.cellCol, t.cellHeader,
        collapse(Entities.decode(t.buf.toString)))
      t.col = t.cellCol + math.max(1, t.cellSpan)
      t.buf.setLength(0)
      t.inCell = false
    }

    var i = 0
    while (i < nodes.length) {
      val nd = nodes(i)
      nd.nodeType match {
        case NodeType.StartTag =>
          val tag = nd.tagName.toLowerCase(java.util.Locale.ROOT)
          tag match {
            case "table" =>
              stack += new Tbl({ val k = nextTable; nextTable += 1; k })
            case "tr" if stack.nonEmpty =>
              val t = stack(stack.length - 1)
              closeCell(t)
              t.row += 1
              t.col = 0
            case ("td" | "th") if stack.nonEmpty =>
              val t = stack(stack.length - 1)
              closeCell(t)
              if (t.row < 0) t.row = 0 // cell before any <tr>: implicit row
              t.inCell = true
              t.cellRow = t.row
              t.cellCol = t.col
              t.cellHeader = tag == "th"
              t.cellSpan = nd.attrInt("colspan").filter(_ >= 1).getOrElse(1)
            case _ => // transparent (thead/tbody/div/b/…)
          }
        case NodeType.CloseTag =>
          val tag = nd.tagName.toLowerCase(java.util.Locale.ROOT)
          tag match {
            case "table" if stack.nonEmpty =>
              closeCell(stack(stack.length - 1))
              stack.remove(stack.length - 1)
            case ("td" | "th") if stack.nonEmpty =>
              closeCell(stack(stack.length - 1))
            case "tr" if stack.nonEmpty =>
              closeCell(stack(stack.length - 1))
            case _ =>
          }
        case NodeType.Content =>
          // text belongs to EVERY open cell on the stack (DOM textContent:
          // a nested table's text is also part of the outer cell)
          var k = 0
          while (k < stack.length) {
            if (stack(k).inCell) stack(k).buf.append(nd.text)
            k += 1
          }
        case _ => // remarks ignored
      }
      i += 1
    }
    while (stack.nonEmpty) { // EOF closes what is left
      closeCell(stack(stack.length - 1))
      stack.remove(stack.length - 1)
    }
    out.toArray
  }

  private def collapse(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var pendingWs = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c) || c == '\u00A0') pendingWs = true
      else {
        if (pendingWs && sb.length > 0) sb.append(' ')
        pendingWs = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
