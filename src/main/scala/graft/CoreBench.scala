package graft

import java.util.concurrent.{Callable, Executors, TimeUnit}
import graft.core.Extractor
import graft.sources.PagesSynth

/** Pure-JVM core throughput bench (no Spark): parse+extract a deterministic
  * in-memory corpus on a fixed thread pool. Isolates scanner/extractor
  * scaling from Spark scheduling/shuffle — the number BASELINE.md cites as
  * single-node core throughput.
  *
  *   sbt "runMain graft.CoreBench [docs] [threads,threads,...]"
  */
object CoreBench {
  def main(args: Array[String]): Unit = {
    val docs = args.headOption.map(_.toInt).getOrElse(60000)
    val levels = args.drop(1).headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1, 8, 32))

    // materialize corpus once (excluded from timing)
    val corpus = (0L until docs.toLong).map(i =>
      PagesSynth.htmlFor(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
    val totalBytes = corpus.map(_.length.toLong).sum
    println(f"corpus: $docs docs, ${totalBytes / 1e6}%.1f MB html")

    val scanOnly = args.length > 2 && args(2) == "scan"

    def run(threads: Int): Double = {
      val pool = Executors.newFixedThreadPool(threads)
      val chunks = corpus.grouped(math.max(docs / (threads * 8), 1)).toSeq
      val t0 = System.nanoTime()
      val futs = chunks.map(ch => pool.submit(new Callable[Long] {
        def call(): Long = {
          var nodes = 0L
          if (scanOnly)
            ch.foreach(b => graft.core.HtmlScanner.scan(b)(_ => { nodes += 1; true }))
          else
            ch.foreach(b => nodes += Extractor.extractBytes(b).nodeCount)
          nodes
        }
      }))
      futs.foreach(_.get())
      val dt = (System.nanoTime() - t0) / 1e9
      pool.shutdown(); pool.awaitTermination(1, TimeUnit.MINUTES)
      dt
    }

    run(levels.max) // warm-up (JIT)
    val base = levels.map { t =>
      val reps = (1 to 3).map(_ => run(t))
      val best = reps.min
      println(f"threads=$t%2d wall=${best}%.2fs docs/s=${docs / best}%.0f " +
        f"MB/s=${totalBytes / 1e6 / best}%.1f (reps ${reps.map(r => f"$r%.2f").mkString(",")})")
      t -> (docs / best)
    }
    for (Seq((tl, rl), (th, rh)) <- base.sliding(2))
      println(f"scaling ${tl}->${th}: efficiency=${rh / (rl * th / tl)}%.3f")
  }
}
