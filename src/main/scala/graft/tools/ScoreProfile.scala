package graft.tools

import graft.corpus.WebCorpus
import graft.core.{Html, Rx, Tokenizers}

/** Temporary: loop the score stage at 32 threads for stack sampling. */
object ScoreProfile {
  def main(args: Array[String]): Unit = {
    val docs = (0L until 2000L).map { i =>
      val p = WebCorpus.page(i)
      val text = Html.extract(Html.decodeBytes(p.html)).text
      (text, Rx.tokenSpans(text, Tokenizers.whitespace))
    }.toArray
    val ts = (0 until 32).map { tid =>
      new Thread(() => {
        var x = 0L
        while (true) {
          val (text, spans) = docs(((x + tid) % docs.length).toInt)
          x += graft.engine.Scorer.scoreSpans(text, spans).length
        }
      })
    }
    ts.foreach(_.setDaemon(true)); ts.foreach(_.start())
    Thread.sleep(120000)
  }
}
