package graft.tools

import graft.engine.{Extraction, PageRow}
import graft.corpus.WebCorpus
import java.util.concurrent.atomic.AtomicLong

/** Plain-thread microbench of the per-doc extraction kernel — isolates
  * kernel-level scaling (locks, allocation) from Spark scheduling.
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val nDocs = 60000
    val stages: Seq[(String, Long => Long)] = Seq(
      "gen_only" -> { i => WebCorpus.page(i).html.length.toLong },
      "gen+html" -> { i =>
        val p = WebCorpus.page(i)
        graft.core.Html.extract(graft.core.Html.decodeBytes(p.html)).text.length.toLong
      },
      "gen+html+tok" -> { i =>
        val p = WebCorpus.page(i)
        val text = graft.core.Html.extract(graft.core.Html.decodeBytes(p.html)).text
        graft.core.Rx.tokenSpans(text, graft.core.Tokenizers.whitespace).length.toLong
      },
      "gen+html+tok+score" -> { i =>
        val p = WebCorpus.page(i)
        val text = graft.core.Html.extract(graft.core.Html.decodeBytes(p.html)).text
        val spans = graft.core.Rx.tokenSpans(text, graft.core.Tokenizers.whitespace)
        graft.engine.Scorer.scoreSpans(text, spans).length.toLong
      },
      "full" -> { i =>
        val p = WebCorpus.page(i)
        Extraction.extractOne(PageRow(p.url, p.warc_ts, p.html, p.text, p.lang)).n_tokens.toLong
      },
    )
    // tail components over a fixed pre-extracted text corpus — where do the
    // ~40 µs/doc between gen+html+tok+score and full go?
    val texts = (0L until 256L).map { i =>
      graft.core.Html.extract(graft.core.Html.decodeBytes(WebCorpus.page(i).html)).text
    }.toArray
    val tails: Seq[(String, Long => Long)] = Seq(
      "tail_sha256" -> { i => Extraction.sha256Hex(texts((i % 256).toInt)).length.toLong },
      "tail_simhash" -> { i => graft.core.Fingerprint.simhash64(texts((i % 256).toInt)) },
      "tail_langid" -> { i => graft.core.LangId.detect(texts((i % 256).toInt)).length.toLong },
    )
    def work(threads: Int, f: Long => Long): Double = {
      val counter = new AtomicLong(0)
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { tid =>
        new Thread(() => {
          var i = tid.toLong
          while (i < nDocs) { counter.addAndGet(f(i)); i += threads }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      require(counter.get() > 0)
      nDocs / sec
    }
    (stages ++ tails).foreach { case (name, f) =>
      System.gc()
      work(8, f) // warm-up
      // best-of-3 per level to shake off GC-debt noise
      val results = Seq(1, 8, 32).map(t => t -> (0 until 3).map(_ => work(t, f)).max)
      val line = results.map { case (t, v) => f"t$t=$v%.0f" }.mkString(" ")
      val eff = results(2)._2 / results(1)._2 / 4
      println(f"$name%-20s $line  eff8->32=$eff%.2f")
    }
  }
}
