package graft.tools

import graft.engine.{Extraction, PageRow}

/** Single-threaded microbenchmark of the per-document extraction kernel on
  * q24-shaped tiny invoice lines — splits the fixed per-doc cost from the
  * per-byte cost (no Spark, no shuffle, no sort).
  * Usage: runMain graft.tools.MicroBench [nDocs]
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    def textOf(i: Int): String =
      s"Rechnung Anzahl ${i % 90 + 10} Betrag ${i % 4000 + 100},${"%02d".format(i % 100)} " +
        s"am ${i % 28 + 1}.0${i % 9 + 1}.2019 Rabatt ${i % 10} % Kontakt kunde$i@firma.de"
    // warm-up
    (0 until 20000).foreach(i => Extraction.extractOne(PageRow(s"$i", null, Array.empty[Byte], textOf(i), "")))
    var labels = 0L
    val t0 = System.nanoTime()
    (0 until n).foreach { i =>
      val d = Extraction.extractOne(PageRow(s"$i", null, Array.empty[Byte], textOf(i), ""))
      labels += d.labels.length
    }
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[micro] extractOne: $n docs in $sec%.2f s = ${n / sec}%.0f docs/s/core (1 thread), $labels labels")
  }
}
