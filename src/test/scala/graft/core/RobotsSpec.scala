package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import RobotsTxt.{Rule, allowed, rulesFor}

/** RFC 9309 subset semantics: group selection, merge, longest-match with
  * allow tie-win, empty Disallow, comments, junk robustness.
  */
class RobotsSpec extends AnyFunSuite {

  private val body =
    """# demo
      |User-agent: graftbot
      |Disallow: /a/
      |Allow: /a/pub   # inline comment
      |
      |User-agent: other
      |User-agent: *
      |Disallow: /b/
      |Crawl-delay: 10
      |Sitemap: https://x/s.xml
      |""".stripMargin

  test("exact group selected over *, star for unknown agents") {
    assert(rulesFor(body, "GraftBot") ==
      Vector(Rule("/a/", allow = false), Rule("/a/pub", allow = true)))
    assert(rulesFor(body, "nobody") == Vector(Rule("/b/", allow = false)))
    assert(rulesFor(body, "other") == Vector(Rule("/b/", allow = false)))
  }

  test("longest match wins; Allow wins a length tie; no match allows") {
    val rs = rulesFor(body, "graftbot")
    assert(!allowed(rs, "/a/x"))
    assert(allowed(rs, "/a/pub/x"))
    assert(allowed(rs, "/c/anything"))
    // explicit tie: same length allow + disallow
    val tie = Vector(Rule("/t/", allow = false), Rule("/t/", allow = true))
    assert(allowed(tie, "/t/z"))
  }

  test("multiple groups for one agent merge; empty Disallow = allow-all group") {
    val b =
      """User-agent: bot
        |Disallow: /x/
        |User-agent: *
        |Disallow: /y/
        |User-agent: bot
        |Disallow: /z/
        |""".stripMargin
    assert(rulesFor(b, "bot") ==
      Vector(Rule("/x/", allow = false), Rule("/z/", allow = false)))
    val empty =
      """User-agent: bot
        |Disallow:
        |User-agent: *
        |Disallow: /all/
        |""".stripMargin
    // bot HAS a group (empty disallow) → star ignored → everything allowed
    assert(rulesFor(empty, "bot").isEmpty)
    assert(allowed(rulesFor(empty, "bot"), "/all/x"))
  }

  test("an exact group with ZERO rules still suppresses the * group") {
    val b = "User-agent: *\nDisallow: /\nUser-agent: graftbot\n"
    assert(rulesFor(b, "graftbot").isEmpty)
    assert(allowed(rulesFor(b, "graftbot"), "/anything"))
    assert(!allowed(rulesFor(b, "someone-else"), "/anything"))
  }

  test("a user-agent line after rules starts a new group") {
    val b =
      """User-agent: a
        |Disallow: /only-a/
        |User-agent: b
        |Disallow: /only-b/
        |""".stripMargin
    assert(rulesFor(b, "a") == Vector(Rule("/only-a/", allow = false)))
    assert(rulesFor(b, "b") == Vector(Rule("/only-b/", allow = false)))
  }

  test("never throws on arbitrary text (property)") {
    val prop = Prop.forAll(Gen.asciiStr) { s =>
      rulesFor(s, "bot"); allowed(rulesFor(s, "*"), "/p"); true
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300)
        .withInitialSeed(org.scalacheck.rng.Seed(7L)), prop)
    assert(res.passed, res.status.toString)
  }
}
