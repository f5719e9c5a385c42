package graft.tools

import graft.core.{Normalize, Rx}
import graft.engine.{Extraction, Scorer}

/** Single-thread microbench of the q24 extraction kernel components —
  * builder-side instrumentation (guide §1: measure first), not part of the
  * measured bench.
  */
object KernelProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    def text(i: Long): String = {
      val cents = 100000 + i % 90000
      s"Rechnung Anzahl ${i % 90 + 3} Betrag ${cents / 100},${"%02d".format(cents % 100)} " +
        s"am ${"%02d".format(i % 28 + 1)}.${"%02d".format(i % 12 + 1)}.20${i % 30} Rabatt ${i % 100} % Kontakt kunde$i@firma.de"
    }
    def time(label: String)(f: Long => Any): Unit = {
      // warm
      var i = 0L
      while (i < n / 10) { f(i); i += 1 }
      val t0 = System.nanoTime()
      i = 0L
      while (i < n) { f(i); i += 1 }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s ${sec / n * 1e6}%8.2f us/row  (${sec}%.2f s / $n)")
    }
    time("build-text")(i => text(i))
    time("tokenize")(i => Rx.whitespaceTokensPacked(text(i)))
    time("tokenize+score") { i =>
      val t = text(i)
      Scorer.scorePacked(t, Rx.whitespaceTokensPacked(t))
    }
    time("extractLabelsOnly")(i => Extraction.extractLabelsOnly(text(i)))
    // headline-extraction kernel split over the real synthetic corpus
    val pages = (0L until 2000L).map { i =>
      val p = graft.corpus.WebCorpus.page(i)
      graft.engine.PageRow(p.url, p.warc_ts, p.html, p.text, p.lang)
    }.toArray
    def corpusTime(label: String)(f: graft.engine.PageRow => Any): Unit = {
      var i = 0
      while (i < 2000) { f(pages(i)); i += 1 } // warm
      val t0 = System.nanoTime()
      var k = 0
      while (k < 10) {
        i = 0
        while (i < 2000) { f(pages(i)); i += 1 }
        k += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s ${sec / 20000 * 1e6}%8.2f us/doc  (${sec}%.2f s / 20000)")
    }
    corpusTime("headline.extractOne")(p => graft.engine.Extraction.extractOne(p))
    corpusTime("headline.decodeBytes")(p => graft.core.Html.decodeBytes(p.html))
    corpusTime("headline.htmlExtract")(p =>
      graft.core.Html.extract(graft.core.Html.decodeBytes(p.html)))
    val texts = pages.map(p => graft.core.Html.extract(graft.core.Html.decodeBytes(p.html)).text)
    corpusTime("headline.tokenize+score(real)") { p =>
      val t = texts(Math.floorMod(p.url.hashCode, 2000))
      Scorer.scorePacked(t, Rx.whitespaceTokensPacked(t))
    }
    corpusTime("headline.simhash(real)")(p =>
      graft.core.Fingerprint.simhash64(texts(Math.floorMod(p.url.hashCode, 2000))))
    corpusTime("headline.tokenize")(p => Rx.whitespaceTokensPacked(p.text))
    corpusTime("headline.score") { p =>
      Scorer.scorePacked(p.text, Rx.whitespaceTokensPacked(p.text))
    }
    corpusTime("headline.sha256")(p => Extraction.sha256Hex(p.text))
    corpusTime("headline.simhash")(p => graft.core.Fingerprint.simhash64(p.text))
    corpusTime("headline.langid")(p => graft.core.LangId.detect(p.text))
    time("normalizeToDate")(i => Normalize.normalizeToDate(s"${"%02d".format(i % 28 + 1)}.${"%02d".format(i % 12 + 1)}.20${i % 30}"))
    time("normalizeToFloat")(i => Normalize.normalizeToFloat(s"${1000 + i % 9000},${i % 100}"))
    time("normalizeToPercentage")(i => Normalize.normalizeToPercentage(s"${i % 100} %"))
  }
}
