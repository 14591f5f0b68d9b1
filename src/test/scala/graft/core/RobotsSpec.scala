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

  test("wildcard patterns: * any-sequence, final $ anchors (RFC 9309 §2.2.3)") {
    import RobotsTxt.patternMatches
    // Google's published examples for /fish*, /*.php, /*.php$
    assert(patternMatches("/fish*", "/fish"))
    assert(patternMatches("/fish*", "/fishheads/yummy.html"))
    assert(!patternMatches("/fish*", "/Fish.asp"))
    assert(patternMatches("/*.php", "/index.php"))
    assert(patternMatches("/*.php", "/folder/filename.php?parameters"))
    assert(patternMatches("/*.php", "/filename.php5")) // unanchored
    assert(!patternMatches("/*.php", "/windows.PHP"))
    assert(patternMatches("/*.php$", "/filename.php"))
    assert(patternMatches("/*.php$", "/folder/filename.php"))
    assert(!patternMatches("/*.php$", "/filename.php5"))
    assert(!patternMatches("/*.php$", "/filename.php/"))
    assert(patternMatches("/fish*.php", "/fishheads/catfish.php?parameters"))
    // $ is only special as the FINAL character; elsewhere it is literal
    assert(patternMatches("/a$b", "/a$bc"))
    assert(!patternMatches("/a$b", "/ab"))
    // anchored exact match, multi-star greedy-leftmost, trailing *$
    assert(patternMatches("/p$", "/p"))
    assert(!patternMatches("/p$", "/page"))
    assert(patternMatches("/a*b*c", "/aXbYbZc"))
    assert(!patternMatches("/a*b*c", "/aXc"))
    assert(patternMatches("/x*$", "/x/anything/at/all"))
    // plain patterns stay byte-identical to the prefix baseline
    assert(patternMatches("/plain/", "/plain/sub"))
    assert(!patternMatches("/plain/", "/plai"))
  }

  test("wildcard precedence: as-written length, Allow wins ties; /$ root case") {
    import RobotsTxt.Rule
    // the classic "allow only the root page" robots idiom
    val rootOnly = Vector(Rule("/$", allow = true), Rule("/", allow = false))
    assert(allowed(rootOnly, "/"))
    assert(!allowed(rootOnly, "/page"))
    // longer wildcard pattern beats shorter literal
    val r2 = Vector(Rule("/page", allow = true), Rule("/*.htm", allow = false))
    assert(!allowed(r2, "/page.htm"))  // /*.htm len 6 > /page len 5
    assert(allowed(r2, "/page.php"))
    // tie between a wildcard and a literal of equal length → Allow wins
    val r3 = Vector(Rule("/ab*", allow = true), Rule("/abc", allow = false))
    assert(allowed(r3, "/abc"))
    // end-to-end: wildcard rules flow through rulesFor untouched
    val b = "User-agent: bot\nDisallow: /*.pdf$\nAllow: /pub*\n"
    val rs = rulesFor(b, "bot")
    assert(rs == Vector(Rule("/*.pdf$", allow = false), Rule("/pub*", allow = true)))
    assert(!allowed(rs, "/doc/x.pdf"))
    assert(!allowed(rs, "/pub/x.pdf")) // /*.pdf$ len 7 beats /pub* len 5
    assert(allowed(rs, "/pub/x.html"))
  }

  test("patternMatches agrees with its own regex compilation (q61 contract)") {
    // q61 evaluates admission via regexp_like(path, patternToRegex(pat)) in
    // Spark and the same conversion in DuckDB SQL; this pins the in-JVM
    // matcher to that regex semantics over random patterns and paths
    // '\n' is in the alphabet deliberately: Java's '$' end anchor also
    // matches before a final line terminator, which is why patternToRegex
    // emits '\z' — a newline-bearing path is the case that distinguishes
    // them (round-4 advice finding)
    val chars = Gen.oneOf('a', 'b', '/', '.', '*', '$', '\n')
    val str = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, chars).map(_.mkString))
    val prop = Prop.forAll(str, str) { (pat, path) =>
      val rx = java.util.regex.Pattern.compile(RobotsTxt.patternToRegex(pat))
      RobotsTxt.patternMatches(pat, path) == rx.matcher(path).find()
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(2000)
        .withInitialSeed(org.scalacheck.rng.Seed(13L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("crawl-delay: group selection mirrors rulesFor; junk values ignored") {
    import RobotsTxt.crawlDelayFor
    val b =
      """User-agent: graftbot
        |Crawl-delay: 2.5
        |User-agent: *
        |Crawl-delay: 9
        |""".stripMargin
    assert(crawlDelayFor(b, "GraftBot") === Some(2.5))
    assert(crawlDelayFor(b, "nobody") === Some(9.0))
    // an exact group WITHOUT a delay suppresses the * group's delay
    val noDelay = "User-agent: graftbot\nDisallow: /x/\nUser-agent: *\nCrawl-delay: 9\n"
    assert(crawlDelayFor(noDelay, "graftbot") === None)
    // junk / negative values ignored; last valid value of merged groups wins
    val junk =
      """User-agent: bot
        |Crawl-delay: nope
        |Crawl-delay: -3
        |Crawl-delay: 4
        |User-agent: bot
        |Crawl-delay: 7
        |""".stripMargin
    assert(crawlDelayFor(junk, "bot") === Some(7.0))
    assert(crawlDelayFor("", "bot") === None)
  }

  test("crawl-delay terminates user-agent accumulation in BOTH parsers (group model agrees)") {
    import RobotsTxt.crawlDelayFor
    // 'UA: a / Crawl-delay / UA: b / …' — the delay line must close a's
    // group in rulesFor exactly as it does in crawlDelayFor, or admission
    // rules and politeness delay would attribute the SAME body lines to
    // different groups (round-4 review finding)
    val b =
      """User-agent: a
        |Crawl-delay: 5
        |User-agent: b
        |Crawl-delay: 7
        |Disallow: /x/
        |""".stripMargin
    assert(crawlDelayFor(b, "a") === Some(5.0))
    assert(crawlDelayFor(b, "b") === Some(7.0))
    assert(rulesFor(b, "a").isEmpty, "b's group rules leaked into a's group")
    assert(rulesFor(b, "b") === Vector(Rule("/x/", allow = false)))
  }

  test("UA group with ONLY a Crawl-delay still governs admission (accessors agree)") {
    import RobotsTxt.crawlDelayFor
    // round-4 advice scenario: an exact-UA group whose only member line is
    // a Crawl-delay. Both accessors must attribute the body to the SAME
    // governing group: the delay comes from the exact group AND admission
    // uses the exact group's (empty ⇒ allow-everything) rules — NOT the
    // '*' group's Disallow. Group existence alone suppresses the fallback
    // (exactSeen is set on the user-agent line in both parsers).
    val b = "User-agent: graftbot\nCrawl-delay: 3\nUser-agent: *\nDisallow: /\nCrawl-delay: 9\n"
    assert(crawlDelayFor(b, "graftbot") === Some(3.0))
    assert(rulesFor(b, "graftbot").isEmpty,
      "'*' rules leaked into the exact group")
    assert(allowed(rulesFor(b, "graftbot"), "/anything"),
      "admission fell back to the '*' group despite an exact group existing")
    assert(!allowed(rulesFor(b, "other"), "/anything"))
    assert(crawlDelayFor(b, "other") === Some(9.0))
  }

  test("never throws on arbitrary text (property)") {
    val prop = Prop.forAll(Gen.asciiStr) { s =>
      rulesFor(s, "bot"); allowed(rulesFor(s, "*"), "/p")
      RobotsTxt.crawlDelayFor(s, "bot"); true
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300)
        .withInitialSeed(org.scalacheck.rng.Seed(7L)), prop)
    assert(res.passed, res.status.toString)
  }
}
