package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Generator}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.core.{HtmlScanner, NodeType}

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
