package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Generator}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.core.{HtmlScanner, NodeType, Selector}

/** `html_nodes(html binary)` — a native Catalyst `Generator` (UDTF): one
  * page row explodes into its flat node rows WITHOUT materializing an
  * `ArrayType` COLUMN of all nodes per page (the `udf → array → posexplode`
  * shape serializes the whole array into the row — SURVEY.md §4.3). The
  * scanner's transient JVM node array still exists for the duration of one
  * page's iteration; what is avoided is the serialized per-row array and
  * its copy through the exchange.
  *
  * SQL: `SELECT url, n.* FROM pages LATERAL VIEW html_nodes(html) n`
  *
  * Attrs surface as a map<string,string> parsed lazily per START node —
  * nodes of other types pay nothing (reference entry point 3, lazy attrs
  * [R: HtmlParser.cpp · parseNodeProps]).
  */
case class HtmlNodes(child: Expression) extends Generator
    with UnaryLike[Expression] with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def prettyName: String = "html_nodes"

  override def elementSchema: StructType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("ntype", StringType, nullable = false),
    StructField("tag", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("attrs", MapType(StringType, StringType), nullable = false),
    StructField("self_closing", BooleanType, nullable = false),
    StructField("cdata", BooleanType, nullable = false),
    StructField("start", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val html = child.eval(input).asInstanceOf[Array[Byte]]
    if (html == null) return Iterator.empty
    val nodes = HtmlScanner.parse(html)
    nodes.iterator.map { nd =>
      val attrs =
        if (nd.nodeType == NodeType.StartTag) nd.attrs else graft.core.Attrs.Empty
      val keys = new GenericArrayData(
        attrs.map(a => UTF8String.fromString(a.name)).asInstanceOf[Array[Any]])
      // bare attributes (no `=value`) surface as NULL map values — matching
      // the typed API (HNode.attr → None) and the reference's NULL-valued
      // props; `attrs['checked'] IS NULL` distinguishes bare from `=""`
      val vals = new GenericArrayData(
        attrs.map(a =>
          (if (a.value == null) null else UTF8String.fromString(a.value)): Any))
      InternalRow(
        nd.idx,
        UTF8String.fromString(NodeType.name(nd.nodeType)),
        UTF8String.fromString(nd.tagName),
        UTF8String.fromString(if (nd.nodeType == NodeType.StartTag) "" else nd.text),
        new ArrayBasedMapData(keys, vals),
        nd.selfClosing,
        nd.isCdata,
        nd.start,
        nd.end)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlNodes =
    copy(child = newChild)
}

/** `html_select(html binary, selector string)` — CSS-selector query as a
  * native Catalyst `Generator`: one page row explodes into its MATCHING
  * elements only ([[graft.core.Selector]] subset — tag/#id/.class/[attr
  * ops] compounds; descendant/child/sibling combinators; lists). Each row
  * carries the element's node index, tag, lazily parsed attrs, byte span
  * and entity-decoded whitespace-collapsed inner text.
  *
  * SQL: `SELECT url, m.* FROM pages
  *       LATERAL VIEW html_select(html, 'article > p a[href]') m`
  *
  * The selector is parsed ONCE per distinct string (cached on the
  * instance — in practice it is a literal); an invalid selector yields
  * zero rows for every page, matching [[graft.core.Selector.select]].
  */
case class HtmlSelect(left: Expression, right: Expression) extends Generator
    with BinaryLike[Expression] with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType, StringType)
  override def prettyName: String = "html_select"

  override def elementSchema: StructType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("tag", StringType, nullable = false),
    StructField("attrs", MapType(StringType, StringType), nullable = false),
    StructField("start", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false),
    StructField("text", StringType, nullable = false)))

  // (selector string → parsed) cache; selectors are almost always literals
  @transient private var cachedKey: String = _
  @transient private var cachedSel: Option[List[List[Selector.Step]]] = None

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val html = left.eval(input).asInstanceOf[Array[Byte]]
    val selU = right.eval(input).asInstanceOf[UTF8String]
    if (html == null || selU == null) return Iterator.empty
    val selStr = selU.toString
    if (cachedKey == null || cachedKey != selStr) {
      cachedKey = selStr
      cachedSel = Selector.parse(selStr)
    }
    cachedSel match {
      case None => Iterator.empty
      case Some(sels) =>
        val nodes = HtmlScanner.parse(html)
        Selector.selectParsed(nodes, sels).iterator.map { e =>
          val nd = nodes(e.nodeIdx)
          val attrs = nd.attrs
          val keys = new GenericArrayData(
            attrs.map(a => UTF8String.fromString(a.name)).asInstanceOf[Array[Any]])
          val vals = new GenericArrayData(
            attrs.map(a =>
              (if (a.value == null) null else UTF8String.fromString(a.value)): Any))
          InternalRow(
            e.nodeIdx,
            UTF8String.fromString(nd.tagName),
            new ArrayBasedMapData(keys, vals),
            nd.start,
            nd.end,
            UTF8String.fromString(Selector.innerText(nodes, e)))
        }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HtmlSelect =
    copy(left = newLeft, right = newRight)
}

/** `html_tables(html binary)` — table extraction as a native Catalyst
  * `Generator`: one page row explodes into its table CELLS
  * ([[graft.core.TableExtractor]] — implicit-close-aware single pass) as
  * (table_idx, row, col, header, text) grid rows.
  *
  * SQL: `SELECT url, t.* FROM pages LATERAL VIEW html_tables(html) t`
  */
case class HtmlTables(child: Expression) extends Generator
    with UnaryLike[Expression] with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def prettyName: String = "html_tables"

  override def elementSchema: StructType = StructType(Seq(
    StructField("table_idx", IntegerType, nullable = false),
    StructField("row", IntegerType, nullable = false),
    StructField("col", IntegerType, nullable = false),
    StructField("header", BooleanType, nullable = false),
    StructField("text", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val html = child.eval(input).asInstanceOf[Array[Byte]]
    if (html == null) return Iterator.empty
    graft.core.TableExtractor.cells(HtmlScanner.parse(html)).iterator.map { c =>
      InternalRow(c.table, c.row, c.col, c.header, UTF8String.fromString(c.text))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlTables =
    copy(child = newChild)
}
