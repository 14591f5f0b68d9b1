package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** RFC 3986 §6 syntax-based normalization: the safe subset only, pinned
  * case by case, plus idempotence and never-throws properties.
  */
class UrlCanonSpec extends AnyFunSuite {
  import UrlCanon.canonicalize

  test("pinned canonicalization cases") {
    val cases = Seq(
      "HTTP://Example.COM:80/a" -> "http://example.com/a",
      "https://Example.com:443/a" -> "https://example.com/a",
      "https://example.com:8443/a" -> "https://example.com:8443/a",
      "http://example.com" -> "http://example.com/",
      "http://example.com?q=1" -> "http://example.com/?q=1",
      "http://example.com/a#frag" -> "http://example.com/a",
      "http://example.com/%7euser" -> "http://example.com/~user",
      "http://example.com/a%2fb" -> "http://example.com/a%2Fb",
      "http://example.com/%41%2D%5a" -> "http://example.com/A-Z",
      "http://example.com/a?x=%41&y=%2f" -> "http://example.com/a?x=A&y=%2F",
      "  http://example.com/a  " -> "http://example.com/a",
      "http://User@Example.com/a" -> "http://User@example.com/a",
      // not scheme://… → trimmed only
      "not a url" -> "not a url",
      "mailto:x@y" -> "mailto:x@y",
      // damaged escapes: the bare '%' is itself encoded (idempotence)
      "http://example.com/a%2" -> "http://example.com/a%252",
      "http://example.com/a%zz" -> "http://example.com/a%25zz",
      "http://example.com/%%%42a" -> "http://example.com/%25%25Ba")
    cases.foreach { case (in, want) =>
      assert(canonicalize(in) === want, s"input: $in")
    }
    assert(canonicalize(null) === null)
  }

  test("idempotent and never throws on arbitrary strings (property)") {
    val urlish = for {
      scheme <- Gen.oneOf("http", "HTTPS", "ftp", "")
      host <- Gen.oneOf("Example.COM", "a.b", "X:80", "y:443", "")
      path <- Gen.listOfN(6, Gen.oneOf('a', 'Z', '/', '%', '2', 'f', '~',
        '?', '#', '=', '@', ':', ' ')).map(_.mkString)
    } yield s"$scheme://$host/$path"
    val anyStr = Gen.oneOf(urlish, Gen.asciiStr)
    val prop = Prop.forAll(anyStr) { s =>
      val once = canonicalize(s)
      canonicalize(once) == once
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(3000)
      .withInitialSeed(org.scalacheck.rng.Seed(29L)), prop)
    assert(res.passed, res.status.toString)
  }
}
