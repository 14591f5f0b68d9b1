package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets.UTF_8
import scala.jdk.CollectionConverters._

/** Golden-file replay (SURVEY.md §5.2.1): every NN.html must produce a node
  * dump byte-identical to NN.nodes and extracted text byte-identical to
  * NN.txt. This is the operationalized "byte-identical to the reference"
  * gate (SURVEY.md §5.3) — the goldens encode the FIXTURES.md semantics.
  */
class FixtureReplaySpec extends AnyFunSuite {

  private val dir = Paths.get("src/test/resources/fixtures")

  private val ids: Seq[String] =
    Files.list(dir).iterator.asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".html"))
      .map(_.stripSuffix(".html"))
      .toSeq.sorted

  test("fixture directory is populated") {
    assert(ids.nonEmpty, s"no fixtures in $dir — run Test/runMain graft.core.FixtureGen")
  }

  ids.foreach { id =>
    test(s"fixture $id: node dump and extracted text are byte-identical") {
      val html = Files.readAllBytes(dir.resolve(s"$id.html"))
      val expNodes = new String(Files.readAllBytes(dir.resolve(s"$id.nodes")), UTF_8)
      val expText = Files.readAllBytes(dir.resolve(s"$id.txt"))
      val nodes = HtmlScanner.parse(html)
      assert(HNode.dump(nodes) === expNodes)
      val got = Extractor.extract(nodes).text.getBytes(UTF_8)
      assert(got.sameElements(expText),
        s"extracted text bytes differ for $id:\n got=${new String(got, UTF_8)}\n exp=${new String(expText, UTF_8)}")
    }
  }
}
