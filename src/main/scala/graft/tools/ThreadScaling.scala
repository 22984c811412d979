package graft.tools

import graft.fixtures.PagesGen
import graft.pipeline.Pipeline
import java.util.concurrent.atomic.AtomicLong

/** Pure-JVM thread-scaling probe (no Spark): runs the full per-doc kernel
  * chain on N plain threads with the process pinned to N cores — separates
  * hardware/GC scaling limits from Spark-layer overhead when e2e scaling
  * efficiency falls short.
  */
object ThreadScaling {
  private def pinTo(cores: Int): Unit = {
    val pid = ProcessHandle.current().pid()
    new ProcessBuilder("taskset", "-pc", s"0-${cores - 1}", pid.toString)
      .redirectErrorStream(true).start().waitFor()
  }

  private def run(threads: Int, docsPerThread: Long): Double = {
    pinTo(threads)
    val lexDe = PagesGen.lexiconFor("de"); lexDe.deleteIndex
    val lexEn = PagesGen.lexiconFor("en"); lexEn.deleteIndex
    val sink = new AtomicLong()
    def work(tid: Int): Unit = {
      var i = tid * docsPerThread
      val end = i + docsPerThread
      var acc = 0L
      while (i < end) {
        val c = Pipeline.correctPage(Pipeline.alignPage(Pipeline.segmentPage(
          PagesGen.page(i).row)), lexDe, lexEn)
        acc += c.nCorrections
        i += 1
      }
      sink.addAndGet(acc)
    }
    // warmup
    val w = (0 until threads).map(t => new Thread(() => work(t)))
    w.foreach(_.start()); w.foreach(_.join())
    val t0 = System.nanoTime()
    val ts = (0 until threads).map(t => new Thread(() => work(t)))
    ts.foreach(_.start()); ts.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    threads * docsPerThread / sec
  }

  def main(args: Array[String]): Unit = {
    val perThread = if (args.nonEmpty) args(0).toLong else 3000L
    val d8 = run(8, perThread)
    val d32 = run(32, perThread)
    println(f"threads=8  ${d8}%9.0f docs/s (${d8 / 8}%7.0f /core)")
    println(f"threads=32 ${d32}%9.0f docs/s (${d32 / 32}%7.0f /core)")
    println(f"pure-kernel scaling efficiency: ${(d32 / d8) / 4}%.3f")
  }
}
