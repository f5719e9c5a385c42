package graft.tools

import graft.core._
import graft.corpus.WebCorpus

/** CLI surface for the core extraction path (no Spark needed): generate or
  * read a page, strip boilerplate, tokenize, normalize detected entities.
  *
  * Usage:
  *   runMain graft.tools.ExtractCli            # 3 synthetic pages
  *   runMain graft.tools.ExtractCli <n>        # n synthetic pages
  *   runMain graft.tools.ExtractCli --file x.html
  */
object ExtractCli {
  def main(args: Array[String]): Unit = {
    val htmls: Seq[(String, String)] = args match {
      case Array("--file", path) =>
        Seq((path, new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
          java.nio.charset.StandardCharsets.UTF_8)))
      case Array(n) if n.forall(_.isDigit) =>
        (0L until n.toLong).map(i => { val p = WebCorpus.page(i); (p.url, Html.decodeBytes(p.html)) })
      case _ =>
        (0L until 3L).map(i => { val p = WebCorpus.page(i); (p.url, Html.decodeBytes(p.html)) })
    }
    htmls.foreach { case (url, html) =>
      val ex = Html.extract(html)
      val spans = Rx.tokenSpans(ex.text, Tokenizers.whitespace)
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(ex.text.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
      println(s"url=$url")
      println(s"  title   = ${ex.title}")
      println(s"  text    = ${ex.text.length} chars, sha256/16=$sha, blocks=${ex.blockSpans.length}")
      println(s"  tokens  = ${spans.length} (whitespace), ${Quality.bpeTokenCount(ex.text)} (bpe-ish)")
      println(s"  lang    = ${LangId.detect(ex.text)}  quality=${f"${Quality.score(ex.text).composite}%.2f"}")
      val entities = spans.flatMap { sp =>
        val s = ex.text.substring(sp.start, sp.end)
        Normalize.normalizeToDate(s).map(v => (sp, "date", v)).orElse(
          if (s.exists(_.isDigit)) Normalize.normalizeToFloat(s).map(v => (sp, "number", v.toString)) else None)
      }.take(8)
      entities.foreach { case (sp, kind, v) =>
        println(f"    [${sp.start}%5d,${sp.end}%5d) $kind%-7s ${ex.text.substring(sp.start, sp.end)}%-14s -> $v")
      }
    }
  }
}
