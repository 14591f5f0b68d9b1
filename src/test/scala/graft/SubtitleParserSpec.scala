package graft.core

import org.scalatest.funsuite.AnyFunSuite


class SubtitleParserSpec extends AnyFunSuite {

  test("SRT golden: index lines, comma decimals, tags and entities stripped") {
    val srt =
      """1
        |00:00:01,000 --> 00:00:02,500
        |{\an8}Hello <i>world</i>
        |second &amp; line
        |
        |2
        |00:01:00,250 --> 00:01:02,000
        |<b>next</b> cue
        |""".stripMargin.getBytes("UTF-8")
    val cues = SubtitleParser.parse(srt)
    assert(SubtitleParser.kind(srt) === "srt")
    assert(cues.toSeq === Seq(
      SubtitleCue(1000, 2500, "Hello world\nsecond & line"),
      SubtitleCue(60250, 62000, "next cue")))
    assert(SubtitleParser.text(srt) ===
      "Hello world\nsecond & line\nnext cue")
  }

  test("WebVTT golden: magic, NOTE blocks, cue ids, settings, karaoke stamps") {
    val vtt =
      """WEBVTT
        |
        |NOTE this is
        |a comment block
        |
        |intro-cue
        |00:01.000 --> 00:02.000 align:start line:0%
        |<c.yellow><00:00:01.200>Hi</c> <v Ann>there</v>
        |
        |STYLE
        |::cue { color: red }
        |
        |00:00:03.000 --> 00:00:04.000
        |bye
        |""".stripMargin.getBytes("UTF-8")
    val cues = SubtitleParser.parse(vtt)
    assert(SubtitleParser.kind(vtt) === "vtt")
    assert(cues.toSeq === Seq(
      SubtitleCue(1000, 2000, "Hi there"),
      SubtitleCue(3000, 4000, "bye")))
  }

  test("same content in SRT and VTT dress parses to identical cues") {
    for (id <- 0 until 24) {
      def body(vtt: Boolean): Array[Byte] = {
        val sep = if (vtt) "." else ","
        val sb = new StringBuilder
        if (vtt) sb.append("WEBVTT\n\n")
        for (c <- 0 until 3) {
          val a = id * 100 + c * 2000
          val b = a + 1500
          def ts(ms: Int) =
            f"${ms / 3600000}%02d:${ms / 60000 % 60}%02d:${ms / 1000 % 60}%02d$sep${ms % 1000}%03d"
          sb.append(ts(a)).append(" --> ").append(ts(b)).append('\n')
          sb.append(s"line one $c\nline two $id\n\n")
        }
        sb.toString.getBytes("UTF-8")
      }
      assert(SubtitleParser.parse(body(false)).toSeq ===
        SubtitleParser.parse(body(true)).toSeq, s"id=$id")
    }
  }

  test("malformed timing lines drop the cue, not the file; BOM tolerated") {
    val srt =
      """1
        |garbage --> 00:00:02,000
        |swallowed
        |
        |2
        |00:00:03,000 --> 00:00:04,000
        |kept
        |""".stripMargin.getBytes("UTF-8")
    assert(SubtitleParser.parse(srt).toSeq ===
      Seq(SubtitleCue(3000, 4000, "kept")))
    val bom = Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++
      "WEBVTT\n\n00:01.000 --> 00:02.000\nx\n".getBytes("UTF-8")
    assert(SubtitleParser.parse(bom).toSeq === Seq(SubtitleCue(1000, 2000, "x")))
  }

  test("timestamp parser: component forms, short fractions, rejects junk") {
    assert(SubtitleParser.parseTs("01:02:03.456") === 3723456L)
    assert(SubtitleParser.parseTs("02:03,456") === 123456L)
    assert(SubtitleParser.parseTs("00:01.5") === 1500L)
    assert(SubtitleParser.parseTs("3.456") === -1L)      // one component
    assert(SubtitleParser.parseTs("a:b.c") === -1L)
    assert(SubtitleParser.parseTs("00:00:00.1234") === -1L) // 4-digit frac
    assert(SubtitleParser.parseTs("") === -1L)
  }

  test("truncation and garbage fuzz never throws; maxCues caps work") {
    val bytes = ("WEBVTT\n\nNOTE x\n\nid-0\n00:00:01.000 --> 00:00:02.000 align:start\n" +
      "<c.y><00:00:01.100>a</c> <i>b</i>\ngamma &amp; d\n\n" +
      "00:00:03.000 --> 00:00:04.000\nmore\n").getBytes("UTF-8")
    for (cut <- 0 to bytes.length) SubtitleParser.parse(bytes.take(cut))
    val rnd = new scala.util.Random(29)
    for (_ <- 1 to 500) {
      val g = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(g)
      SubtitleParser.parse(g)
      SubtitleParser.kind(g)
    }
    val many = (1 to 100).map(i =>
      s"00:00:0$i.000 --> 00:00:0$i.500\nc$i\n").mkString("\n")
    assert(SubtitleParser.parse(many.getBytes("UTF-8"), maxCues = 5).length === 5)
  }
}
