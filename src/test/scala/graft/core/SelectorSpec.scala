package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** Selector engine coverage: pinned golden cases for every supported
  * simple selector / combinator, the tolerant-tree policy (unclosed tags,
  * stray closes, void elements, self-closing), and a randomized
  * cross-check: WELL-FORMED documents are generated from an explicit tree
  * whose structure is known by construction, and Selector's matches are
  * compared against an INDEPENDENT naive matcher evaluated directly on
  * that generated tree — two implementations, one spec.
  */
class SelectorSpec extends AnyFunSuite {

  private def sel(html: String, selector: String): Seq[Int] = {
    val nodes = HtmlScanner.parse(html.getBytes(UTF_8))
    Selector.select(nodes, selector).map(_.nodeIdx).toSeq
  }

  private def selTags(html: String, selector: String): Seq[String] = {
    val nodes = HtmlScanner.parse(html.getBytes(UTF_8))
    Selector.select(nodes, selector).map(e =>
      nodes(e.nodeIdx).tagName.toLowerCase + "#" +
        nodes(e.nodeIdx).attr("id").getOrElse("")).toSeq
  }

  val page: String =
    """<html><body>
      |<div id=a class="article main"><p id=p1>one</p><p id=p2 class=x>two</p>
      |  <span id=s1><p id=p3>deep</p></span></div>
      |<div id=b><a id=l1 href="https://x/1.pdf">A</a>
      |  <a id=l2 href="/rel" rel="nofollow ugc">B</a><br>
      |  <p id=p4>after br</p></div>
      |<p id=p5>top</p>
      |</body></html>""".stripMargin

  test("tag, *, #id, .class selectors") {
    assert(selTags(page, "p") === Seq("p#p1", "p#p2", "p#p3", "p#p4", "p#p5"))
    assert(selTags(page, "#p2") === Seq("p#p2"))
    assert(selTags(page, ".article") === Seq("div#a"))
    assert(selTags(page, ".main.article") === Seq("div#a")) // both tokens
    assert(selTags(page, ".x") === Seq("p#p2"))
    assert(selTags(page, "p.x") === Seq("p#p2"))
    assert(selTags(page, "span.x") === Seq.empty)
    // * matches every element incl. void br: html body div p p span p
    // div a a br p p = 13
    assert(selTags(page, "*").size === 13)
  }

  test("attribute selectors: present, =, ^=, $=, *=, ~=") {
    assert(selTags(page, "a[href]") === Seq("a#l1", "a#l2"))
    assert(selTags(page, "a[rel]") === Seq("a#l2"))
    assert(selTags(page, "[href='/rel']") === Seq("a#l2"))
    assert(selTags(page, "a[href^='https']") === Seq("a#l1"))
    assert(selTags(page, "a[href$='.pdf']") === Seq("a#l1"))
    assert(selTags(page, "a[href*='x/1']") === Seq("a#l1"))
    assert(selTags(page, "a[rel~='ugc']") === Seq("a#l2"))
    assert(selTags(page, "a[rel~='ug']") === Seq.empty) // token, not substring
    assert(selTags(page, "a[rel*='ug']") === Seq("a#l2"))
  }

  test("combinators: descendant, child, adjacent, general sibling; selector lists") {
    assert(selTags(page, "div p") === Seq("p#p1", "p#p2", "p#p3", "p#p4"))
    assert(selTags(page, "div > p") === Seq("p#p1", "p#p2", "p#p4"))
    assert(selTags(page, "span > p") === Seq("p#p3"))
    assert(selTags(page, "#a > p") === Seq("p#p1", "p#p2"))
    assert(selTags(page, "p + p") === Seq("p#p2"))
    // br is void: p#p4's previous element sibling chain is br, a#l2, a#l1
    assert(selTags(page, "a + br") === Seq("br#"))
    assert(selTags(page, "a ~ p") === Seq("p#p4"))
    assert(selTags(page, "#p1 ~ span") === Seq("span#s1"))
    assert(selTags(page, "#p1 + span") === Seq.empty) // p2 sits between
    assert(selTags(page, "#l1, #p5, .x") === Seq("p#p2", "a#l1", "p#p5"))
    assert(selTags(page, "div.article > p.x") === Seq("p#p2"))
    assert(selTags(page, "html body div span p") === Seq("p#p3"))
  }

  test("tolerant tree: unclosed tags, stray closes, void and self-closing") {
    // unclosed <p>s implicitly close at </div>; stray </em> ignored. The
    // tolerant policy has no per-tag implicit-close rules, so the second
    // unclosed <p> NESTS inside the first (documented): 'div > p' sees
    // only the first, descendant 'div p' sees both
    val h = "<div><p>one<p>two</em></div><p>three"
    assert(selTags(h, "div > p").size === 1)
    assert(selTags(h, "div p").size === 2)
    assert(selTags(h, "p > p").size === 1)
    assert(selTags(h, "p").size === 3)
    // void elements never nest: content after <br> stays in the parent
    val v = "<div><br><p id=q>x</p></div>"
    assert(sel(v, "div > p").size === 1)
    assert(sel(v, "br > p").isEmpty)
    assert(sel(v, "br + p").size === 1)
    // self-closing foreign element
    val sc = "<div><thing/><p>x</p></div>"
    assert(sel(sc, "thing + p").size === 1)
    assert(sel(sc, "thing p").isEmpty)
  }

  test("innerText: entity-decoded, whitespace-collapsed, nested content") {
    val h = "<div id=t><p>one &amp; two</p> <span>three</span></div><p>out</p>"
    val nodes = HtmlScanner.parse(h.getBytes(UTF_8))
    val div = Selector.select(nodes, "#t")
    assert(div.length === 1)
    assert(Selector.innerText(nodes, div(0)) === "one & two three")
    // unclosed element: inner text runs to EOF
    val u = HtmlScanner.parse("<div id=t>a<p>b".getBytes(UTF_8))
    assert(Selector.innerText(u, Selector.select(u, "#t")(0)) === "ab")
  }

  test("strict grammar: unsupported syntax parses to None, select returns empty") {
    for (bad <- Seq("", "  ", "p:first-child", "p::before", "a[href", "a[]",
      "[=v]", "p >", "> p", "p,,q", "p,", "a[href!='x']", "ns|div", "p.."))
      assert(Selector.parse(bad).isEmpty, s"accepted: $bad")
    assert(sel(page, "p:first-child").isEmpty)
    // supported forms all parse
    for (good <- Seq("p", "*", "#x", ".y", "p.y#x[a][b='c']", "a b > c + d ~ e",
      "a , b", "[data-x~='t']", "DIV", "input[type=checkbox]"))
      assert(Selector.parse(good).nonEmpty, s"rejected: $good")
  }

  // ------------- randomized cross-check on generated trees -------------

  /** Explicit generated tree: children per node, tag/id/class/attr known. */
  private final case class GNode(tag: String, id: String, classes: Seq[String],
                                 attrs: Map[String, String], kids: Seq[GNode])

  private def render(n: GNode, sb: StringBuilder): Unit = {
    sb.append('<').append(n.tag)
    if (n.id != null) sb.append(" id=\"").append(n.id).append('"')
    if (n.classes.nonEmpty) sb.append(" class=\"").append(n.classes.mkString(" ")).append('"')
    n.attrs.foreach { case (k, v) => sb.append(' ').append(k).append("=\"").append(v).append('"') }
    sb.append('>')
    sb.append("t")
    n.kids.foreach(render(_, sb))
    sb.append("</").append(n.tag).append('>')
  }

  /** Independent naive matcher over the GENERATED tree (not the parsed
    * one): computes matches for a parsed selector by explicit ancestor /
    * sibling walks on the generator's own structure.
    */
  private def naiveMatches(root: GNode, sels: List[List[Selector.Step]]): Seq[String] = {
    // flatten with parent/sibling links, document order
    final case class F(n: GNode, parent: Int, prevSib: Int)
    val flat = scala.collection.mutable.ArrayBuffer.empty[F]
    def walk(n: GNode, parent: Int): Int = {
      val me = flat.length
      flat += F(n, parent, -1)
      var prev = -1
      n.kids.foreach { k =>
        val ki = walk(k, me)
        flat(ki) = flat(ki).copy(prevSib = prev)
        prev = ki
      }
      me
    }
    walk(root, -1)
    def cMatch(i: Int, c: Selector.Compound): Boolean = {
      val f = flat(i)
      (c.tag.isEmpty || f.n.tag == c.tag) &&
        (c.id == null || f.n.id == c.id) &&
        c.classes.forall(f.n.classes.contains) &&
        c.attrs.forall { t =>
          val v = if (t.name == "id") Option(f.n.id)
            else if (t.name == "class") (if (f.n.classes.nonEmpty) Some(f.n.classes.mkString(" ")) else None)
            else f.n.attrs.get(t.name)
          t.op match {
            case 0   => v.isDefined || (t.name == "id" && f.n.id != null)
            case '=' => v.contains(t.value)
            case '^' => v.exists(_.startsWith(t.value))
            case '$' => v.exists(_.endsWith(t.value))
            case '*' => v.exists(_.contains(t.value))
            case '~' => v.exists(_.split("\\s+").contains(t.value))
            case _   => false
          }
        }
    }
    def m(i: Int, r: List[Selector.Step]): Boolean = r match {
      case Nil => true
      case Selector.Step(comb, c) :: rest =>
        cMatch(i, c) && (rest.isEmpty || (comb match {
          case '>' => flat(i).parent >= 0 && m(flat(i).parent, rest)
          case '+' => flat(i).prevSib >= 0 && m(flat(i).prevSib, rest)
          case '~' =>
            Iterator.iterate(flat(i).prevSib)(j => flat(j).prevSib)
              .takeWhile(_ >= 0).exists(m(_, rest))
          case _ =>
            Iterator.iterate(flat(i).parent)(j => flat(j).parent)
              .takeWhile(_ >= 0).exists(m(_, rest))
        }))
    }
    flat.indices.collect {
      case i if sels.exists(s => m(i, s.reverse)) =>
        s"${flat(i).n.tag}#${Option(flat(i).n.id).getOrElse("")}"
    }.toSeq
  }

  test("randomized well-formed trees: Selector == independent naive matcher") {
    val rnd = new scala.util.Random(2026)
    val tags = Array("div", "p", "span", "a", "em", "ul", "li")
    var idSeq = 0
    def gen(depth: Int): GNode = {
      idSeq += 1
      val nk = if (depth >= 4) 0 else rnd.nextInt(4)
      GNode(
        tags(rnd.nextInt(tags.length)),
        s"n$idSeq",
        Seq.fill(rnd.nextInt(3))("c" + rnd.nextInt(4)),
        if (rnd.nextBoolean()) Map("data-k" -> ("v" + rnd.nextInt(3))) else Map.empty,
        Seq.fill(nk)(gen(depth + 1)))
    }
    val selectors = Seq("div", "p", "span a", "div > p", "p + span", "em ~ li",
      ".c0", ".c1.c2", "div.c0 > span", "[data-k]", "[data-k=v1]",
      "[data-k^=v]", "ul li", "div p a", "a, em", "div > div > p",
      "p ~ p", "li + li", "*", "div *", "span[data-k~=v2]")
    (1 to 60).foreach { _ =>
      val root = GNode("html", "root", Nil, Map.empty, Seq.fill(3)(gen(0)))
      val sb = new StringBuilder
      render(root, sb)
      val nodes = HtmlScanner.parse(sb.toString.getBytes(UTF_8))
      selectors.foreach { q =>
        val parsed = Selector.parse(q).get
        val got = Selector.select(nodes, q).map(e =>
          nodes(e.nodeIdx).tagName + "#" + nodes(e.nodeIdx).attr("id").getOrElse("")).toSeq
        val exp = naiveMatches(root, parsed)
        assert(got === exp, s"selector '$q' on ${sb.toString.take(300)}…")
      }
    }
  }

  test("never throws: garbage html, fuzzed selectors") {
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(b)
      val nodes = HtmlScanner.parse(b)
      Selector.select(nodes, "div p, a[href^='x'] > b + i ~ u")
    }
    val chars = "ap.#[]='\"~+> *,:|".toCharArray
    val nodes = HtmlScanner.parse(page.getBytes(UTF_8))
    (0 until 2000).foreach { _ =>
      val q = String.valueOf(Array.fill(1 + rnd.nextInt(12))(chars(rnd.nextInt(chars.length))))
      Selector.parse(q)       // Some or None, never a throw
      Selector.select(nodes, q)
    }
  }
}
