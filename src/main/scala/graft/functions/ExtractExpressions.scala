package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.core.Extractor

/** Static entry points referenced from generated code (doGenCode below calls
  * these by name — keep signatures stable).
  */
object ExtractOps {
  def extractText(html: Array[Byte]): UTF8String =
    UTF8String.fromString(Extractor.extractBytes(html).text)

  def extractMarkdown(html: Array[Byte]): UTF8String =
    UTF8String.fromString(graft.core.MarkdownExtractor.markdown(html))

  /** deflate(text).length * 1000 / text.length — the compression-ratio
    * quality signal (CCNet-style): boilerplate/repetitive text compresses
    * far below natural prose, random noise sits near (or above) 1000.
    * Fixed level + nowrap make the value deterministic for a given input
    * on a given deflate implementation; 0 for empty input.
    */
  def deflateRatioX1000(s: UTF8String): Long = {
    val raw = s.getBytes
    if (raw.length == 0) return 0L
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED, true)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      n * 1000L / raw.length
    } finally d.end()
  }

  def nodeCount(html: Array[Byte]): Int = {
    var n = 0
    graft.core.HtmlScanner.scan(html)(_ => { n += 1; true })
    n
  }

  def decodeEntities(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.core.Entities.decode(s.toString))

  def decodeEntitiesExt(s: UTF8String): UTF8String =
    UTF8String.fromString(
      graft.core.Entities.decode(s.toString, extended = true))

  def urlCanon(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.core.UrlCanon.canonicalize(s.toString))

  def surtKey(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.core.Surt.key(s.toString))

  def nfcNormalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** IDNA ToUnicode over a whole hostname (RFC 3490 via the JDK's
    * `java.net.IDN`): each `xn--` A-label decodes to its U-label; pure
    * ASCII hosts pass through by reference (no alloc on the fast path).
    * `IDN.toUnicode` is specified never to fail — it returns the input
    * unmodified on any error — and the catch-all keeps the
    * never-throws contract even against JDK edge cases.
    */
  def idnUnicode(s: UTF8String): UTF8String = {
    val str = s.toString
    val out = try java.net.IDN.toUnicode(str) catch { case _: Exception => str }
    if (out == str) s else UTF8String.fromString(out)
  }

  /** CP1252's 27 non-Latin-1 codepoints (bytes 0x80–0x9F whose Windows
    * meaning differs from the C1 controls), inverse-mapped char → byte.
    * "Sloppy CP1252" in ftfy's terminology (public: the ftfy docs /
    * WHATWG encoding standard): bytes with no CP1252 assignment fall
    * back to the Latin-1 identity, so BOTH common mis-decodes
    * (read-UTF-8-as-Latin-1 and read-UTF-8-as-CP1252) invert through
    * one table.
    */
  private val cp1252Inv: Array[Int] = {
    // codepoint of CP1252 byte 0x80+i (WHATWG encoding standard table);
    // the five positions equal to their C1 control (0x81, 8D, 8F, 90, 9D)
    // are also covered by the <=0xFF identity branch below
    val cps = Array(
      0x20AC, 0x81, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
      0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0x8D, 0x017D, 0x8F,
      0x90, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
      0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0x9D, 0x017E, 0x0178)
    val inv = Array.fill(0x2200)(-1) // dense; max cp1252 codepoint is U+2122
    var i = 0
    while (i < 32) { inv(cps(i)) = 0x80 + i; i += 1 }
    inv
  }

  /** Mojibake repair (ftfy-lite, deterministic): if the string looks like
    * UTF-8 bytes that were mis-decoded as Latin-1/CP1252 ("caf\u00c3\u00a9",
    * "don\u00e2\u20ac\u2122t"), re-encode each char through the sloppy-CP1252
    * inverse and strictly re-decode as UTF-8; accept only when the whole
    * string decodes cleanly AND something changed. Genuine Latin-1 text
    * ("d\u00e9j\u00e0 vu") re-encodes to bytes that are NOT valid UTF-8, so the
    * strict decode rejects it and the input passes through unchanged —
    * the validity requirement IS the false-positive guard. Iterates to a
    * fixpoint (\u22643 rounds) to unwind double-encoding.
    */
  def fixMojibake(s: UTF8String): UTF8String = {
    val str = s.toString
    var cur = str
    var rounds = 0
    var changed = true
    while (changed && rounds < 3) {
      val next = fixMojibakeOnce(cur)
      changed = next != null
      if (changed) cur = next
      rounds += 1
    }
    if (cur eq str) s else UTF8String.fromString(cur)
  }

  private def fixMojibakeOnce(s: String): String = {
    // fast path: a UTF-8 lead byte seen through Latin-1/CP1252 is a char
    // in [U+00C2,U+00F4] — absent that, nothing here can be mojibake
    var suspicious = false
    var i = 0
    while (i < s.length && !suspicious) {
      val c = s.charAt(i)
      if (c >= 0xC2 && c <= 0xF4) suspicious = true
      i += 1
    }
    if (!suspicious) return null
    val bytes = new Array[Byte](s.length)
    i = 0
    while (i < s.length) {
      val c = s.charAt(i).toInt
      if (c <= 0xFF) bytes(i) = c.toByte
      else {
        val b = if (c < cp1252Inv.length) cp1252Inv(c) else -1
        if (b < 0) return null // not representable as one mis-decoded byte
        bytes(i) = b.toByte
      }
      i += 1
    }
    try {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        .decode(java.nio.ByteBuffer.wrap(bytes)).toString
      if (dec == s) null else dec
    } catch { case _: java.nio.charset.CharacterCodingException => null }
  }

  /** First `<title>` content, entity-decoded, whitespace-collapsed; ""
    * when absent. Early-stops the scan at the title content (A14), so on
    * typical pages only the first few hundred bytes are tokenized.
    */
  def extractTitle(html: Array[Byte]): UTF8String = {
    import graft.core.NodeType
    // pinned semantics (SQL-twin-checkable, q46): the title is the CONTENT
    // node immediately following the first non-self-closing <title> start
    // tag; anything else there (close tag, nested markup, EOF) pins "".
    var armed = false
    var title: String = null
    graft.core.HtmlScanner.scan(html) { nd =>
      if (armed) {
        if (nd.nodeType == NodeType.Content) title = nd.text
        false // early stop either way: first title decides
      } else if (nd.nodeType == NodeType.StartTag &&
          nd.tagName.equalsIgnoreCase("title") && !nd.selfClosing) {
        armed = true; true // a self-closing <title/> is skipped, not armed
      } else true
    }
    val t =
      if (title == null) "" else collapseWs(graft.core.Entities.decode(title))
    UTF8String.fromString(t)
  }

  /** `<meta name|property=KEY content=V>` lookup (og:title, description,
    * robots, …), case-insensitive on the key; "" when absent. Early-stops
    * at `</head>` / `<body>` — metadata lives in the head, so only the
    * prologue is tokenized.
    */
  def extractMeta(html: Array[Byte], key: UTF8String): UTF8String = {
    import graft.core.NodeType
    val target = key.toString
    var found: String = null
    graft.core.HtmlScanner.scan(html) { nd =>
      nd.nodeType match {
        case NodeType.StartTag if nd.tagName.equalsIgnoreCase("meta") =>
          // check BOTH attributes: real pages merge og: and name-based
          // metadata on one tag (name=twitter:title property=og:title)
          val hit = nd.attr("name").exists(_.equalsIgnoreCase(target)) ||
            nd.attr("property").exists(_.equalsIgnoreCase(target))
          if (hit) {
            found = nd.attr("content").getOrElse("")
            false // early stop: first matching meta wins
          } else true
        case NodeType.StartTag if nd.tagName.equalsIgnoreCase("body") => false
        case NodeType.CloseTag if nd.tagName.equalsIgnoreCase("head") => false
        case _ => true
      }
    }
    UTF8String.fromString(
      if (found == null) "" else collapseWs(graft.core.Entities.decode(found)))
  }

  /** Trim + collapse whitespace runs to one space — single char pass, no
    * per-row regex compile. The whitespace set is pinned to EXACTLY what
    * the Java regex `[\s\x{00A0}]` matches (space, \t \n \x0B \f \r,
    * NBSP) so q46's SQL twin derives the identical value; wider Unicode
    * spaces (U+3000 etc.) are deliberately left alone on both sides.
    */
  private def collapseWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ' || (c >= '\t' && c <= '\r') || c == '\u00A0') {
        if (sb.length > 0) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}

/** `extract_markdown(html binary) → string` — the page as Markdown
  * ([[graft.core.MarkdownExtractor]]: headings/links/lists/emphasis/code
  * preserved, boilerplate subtrees dropped under the same policy as
  * `extract_text`), as a codegen'd scalar so a SQL-first user exports a
  * markdown corpus with one projection.
  */
case class ExtractMarkdown(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "extract_markdown"

  override protected def nullSafeEval(input: Any): Any =
    ExtractOps.extractMarkdown(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ExtractOps.extractMarkdown($c)")

  override protected def withNewChildInternal(newChild: Expression): ExtractMarkdown =
    copy(child = newChild)
}

/** `deflate_ratio_x1000(s string) → bigint` — compressed-size/raw-size
  * ×1000 via the JVM's deflate at a fixed level
  * ([[ExtractOps.deflateRatioX1000]]): the repetition/quality signal
  * CCNet-style curation gates on (machine-generated and boilerplate text
  * compresses dramatically below natural prose). Codegen'd scalar; cost
  * is one deflate pass per row, no allocation beyond the fixed window.
  */
case class DeflateRatio(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "deflate_ratio_x1000"

  override protected def nullSafeEval(input: Any): Any =
    ExtractOps.deflateRatioX1000(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ExtractOps.deflateRatioX1000($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

/** `extract_title(html binary) → string` — first title content (decoded,
  * whitespace-collapsed, "" when absent) with the scanner's early-stop, as
  * a codegen'd scalar.
  */
case class ExtractTitle(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "extract_title"

  override protected def nullSafeEval(input: Any): Any =
    ExtractOps.extractTitle(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ExtractOps.extractTitle($c)")

  override protected def withNewChildInternal(newChild: Expression): ExtractTitle =
    copy(child = newChild)
}

/** `extract_meta(html binary, key string) → string` — first
  * `<meta name|property=key content=…>` value (decoded, collapsed, ""
  * when absent), early-stopping at the end of the head.
  */
case class ExtractMeta(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(BinaryType, StringType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "extract_meta"

  override protected def nullSafeEval(html: Any, key: Any): Any =
    ExtractOps.extractMeta(html.asInstanceOf[Array[Byte]],
      key.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (h, k) => s"graft.functions.ExtractOps.extractMeta($h, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ExtractMeta =
    copy(left = newLeft, right = newRight)
}

/** `extract_text(html binary) → string` as a native Catalyst expression with
  * whole-stage codegen (SURVEY.md §4.3): unlike a Scala `udf`, it does not
  * fence WholeStageCodegen, needs no closure serialization per batch, and
  * its null handling is codegen'd. The generated code is a single static
  * call into [[ExtractOps]], so the scanner's fused single-pass extraction
  * is reused verbatim.
  */
case class ExtractText(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "extract_text"

  override protected def nullSafeEval(input: Any): Any =
    ExtractOps.extractText(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ExtractOps.extractText($c)")

  override protected def withNewChildInternal(newChild: Expression): ExtractText =
    copy(child = newChild)
}

/** `html_node_count(html binary) → int` — tokenize-only (no extraction),
  * counts nodes in one pass without materializing anything.
  */
case class HtmlNodeCount(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = IntegerType
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "html_node_count"

  override protected def nullSafeEval(input: Any): Any =
    ExtractOps.nodeCount(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ExtractOps.nodeCount($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlNodeCount =
    copy(child = newChild)
}

/** `decode_entities(s string) → string` — the reference's entity decoder
  * (A13: lt/gt/amp/quot/nbsp + numeric, unknown left verbatim) as a
  * codegen'd scalar function, for SQL users post-processing node text from
  * `html_nodes` (the tokenizer keeps raw bytes so spans stay exact).
  * `decode_entities_ext` additionally decodes the WHATWG-core extended
  * names (Entities extended set) — the SQL twin of
  * `ExtractConfig(extendedEntities = true)`.
  */
case class DecodeEntities(child: Expression, extended: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String =
    if (extended) "decode_entities_ext" else "decode_entities"

  override protected def nullSafeEval(input: Any): Any =
    if (extended) ExtractOps.decodeEntitiesExt(input.asInstanceOf[UTF8String])
    else ExtractOps.decodeEntities(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (extended) "decodeEntitiesExt" else "decodeEntities"
    defineCodeGen(ctx, ev, c => s"graft.functions.ExtractOps.$m($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): DecodeEntities =
    copy(child = newChild)
}

/** `nfc_normalize(s string) → string` — Unicode NFC normalization (canonical
  * composition), the standard text-curation step that collapses
  * `e + U+0301` and `é` into one byte sequence so hashing/dedup/token
  * counting don't split on encoding accidents. Codegen'd via the JDK's
  * `java.text.Normalizer` (the same Unicode tables DuckDB's
  * `nfc_normalize` implements — q65 value-checks the two against each
  * other); the already-NFC fast path (`Normalizer.isNormalized`) returns
  * the input UTF8String unchanged, no allocation.
  */
/** `idn_unicode(host string) → string` — IDNA ToUnicode
  * ([[ExtractOps.idnUnicode]]): decodes punycode `xn--` A-labels so that
  * confusable-skeleton screening (q178) sees the Unicode the USER sees,
  * not the ASCII the DNS sees — the internationalized-domain spoofing
  * surface (q193).
  */
case class IdnUnicode(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "idn_unicode"

  override protected def nullSafeEval(input: Any): Any =
    ExtractOps.idnUnicode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExtractOps.idnUnicode($c)")

  override protected def withNewChildInternal(newChild: Expression): IdnUnicode =
    copy(child = newChild)
}

case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    ExtractOps.nfcNormalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExtractOps.nfcNormalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** `fix_mojibake(s string) → string` — deterministic repair of
  * UTF-8-mis-decoded-as-Latin-1/CP1252 text (see
  * [[ExtractOps.fixMojibake]]); identity on clean text, codegen'd so the
  * repair runs inside the scan stage of a curation pipeline.
  */
case class FixMojibake(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fix_mojibake"

  override protected def nullSafeEval(input: Any): Any =
    ExtractOps.fixMojibake(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExtractOps.fixMojibake($c)")

  override protected def withNewChildInternal(newChild: Expression): FixMojibake =
    copy(child = newChild)
}

/** `url_canon(s string) → string` — RFC 3986 §6 syntax-based URL
  * canonicalization ([[graft.core.UrlCanon]]): the normalization a crawl
  * pipeline applies before url-keyed dedup/partitioning. Codegen'd,
  * idempotent, never throws (see UrlCanonSpec + q68's flag).
  */
case class UrlCanonExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "url_canon"

  override protected def nullSafeEval(input: Any): Any =
    ExtractOps.urlCanon(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExtractOps.urlCanon($c)")

  override protected def withNewChildInternal(newChild: Expression): UrlCanonExpr =
    copy(child = newChild)
}

/** `surt_key(s string) → string` — web-archive SURT key
  * ([[graft.core.Surt]]): canonicalize, drop scheme/userinfo, strip one
  * leading `www.`, reverse host labels comma-joined, keep non-default
  * port, then `)path?query`. The sort key CDX(J) indexes use so one
  * domain's URLs are one contiguous key range. Codegen'd, never throws.
  */
case class SurtKey(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "surt_key"

  override protected def nullSafeEval(input: Any): Any =
    ExtractOps.surtKey(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExtractOps.surtKey($c)")

  override protected def withNewChildInternal(newChild: Expression): SurtKey =
    copy(child = newChild)
}

/** `blocklist_hits(s string, patterns array<string>) → bigint` — total
  * occurrences (overlapping and nested included) of every pattern in the
  * subject, via one [[graft.core.AhoCorasick]] automaton walk: O(|s|) per
  * row REGARDLESS of blocklist size — the UT1-style URL/word screening
  * primitive, where a contains() loop would be O(|s|·patterns). The
  * pattern array must be a literal (it compiles into the automaton, which
  * rides the plan as one reference object, built once, never per row).
  */
case class BlocklistHits(child: Expression, patterns: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "blocklist_hits needs a non-empty literal pattern list")

  @transient private lazy val ac: graft.core.AhoCorasick =
    graft.core.AhoCorasick.buildStrings(patterns)

  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "blocklist_hits"

  override protected def nullSafeEval(input: Any): Any =
    ac.count(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("blocklistAc", ac, "graft.core.AhoCorasick")
    defineCodeGen(ctx, ev, c => s"$acRef.count($c.getBytes())")
  }

  override protected def withNewChildInternal(newChild: Expression): BlocklistHits =
    copy(child = newChild)
}

/** Registers the extraction functions into a session's FunctionRegistry —
  * `spark.sql("SELECT extract_text(html) FROM pages")` becomes valid, for
  * SQL-first users of the engine.
  *
  * Use either
  * `SparkSession.builder.withExtensions(GraftExtensions.inject)` or
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` on
  * spark-submit, or call [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.inject(ext)
}

object GraftExtensions {
  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "extract_text" -> (args => ExtractText(args.head)),
    "extract_markdown" -> (args => ExtractMarkdown(args.head)),
    "deflate_ratio_x1000" -> (args => DeflateRatio(args.head)),
    "extract_title" -> (args => ExtractTitle(args.head)),
    "extract_meta" -> (args => ExtractMeta(args(0), args(1))),
    "html_node_count" -> (args => HtmlNodeCount(args.head)),
    "html_nodes" -> (args => HtmlNodes(args.head)),
    "html_select" -> (args => HtmlSelect(args(0), args(1))),
    "html_tables" -> (args => HtmlTables(args.head)),
    "decode_entities" -> (args => DecodeEntities(args.head)),
    "decode_entities_ext" -> (args => DecodeEntities(args.head, extended = true)),
    "nfc_normalize" -> (args => NfcNormalize(args.head)),
    "idn_unicode" -> (args => IdnUnicode(args.head)),
    "fix_mojibake" -> (args => FixMojibake(args.head)),
    "cdc_chunks" -> (args => CdcChunks(args(0),
      args(1).eval().asInstanceOf[Number].intValue,
      args(2).eval().asInstanceOf[Number].intValue,
      args(3).eval().asInstanceOf[Number].intValue)),
    "url_canon" -> (args => UrlCanonExpr(args.head)),
    "blocklist_hits" -> (args => {
      val arr = args(1).eval()
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      BlocklistHits(args(0),
        (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString))
    }),
    "surt_key" -> (args => SurtKey(args.head)),
    "gale_church" -> (args => GaleChurchAlign(args(0), args(1))),
    "graft_bloom_contains" -> (args => BloomContains(args(0), args(1))),
    "hll_estimate" -> (args => HllEstimate(args.head)),
    "graft_cms_estimate" -> (args => CmsEstimate(args(0), args(1))),
    "vec_dot" -> (args => VecDot(args(0), args(1))),
    "vec_cos" -> (args => VecCos(args(0), args(1))),
    "vec_sqdist" -> (args => VecSqDist(args(0), args(1))),
    "vec_norm" -> (args => VecNorm(args.head)),
    "sorted_inter_count" -> (args => SortedInterCount(args(0), args(1))))

  def inject(ext: SparkSessionExtensions): Unit =
    fns.foreach { case (name, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name),
          new ExpressionInfo("graft.functions.ExtractExpressions", name),
          builder))
    }

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    fns.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.ExtractExpressions", name),
        builder)
    }

  private val registered =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Idempotent [[register]] — callable from every query builder without
    * re-register log spam.
    */
  def ensureRegistered(spark: SparkSession): Unit = registered.synchronized {
    if (!registered.contains(spark)) { register(spark); registered.add(spark) }
  }
}
