package graft.tools

import graft.engine.{Extraction, PageRow}
import graft.corpus.WebCorpus

/** Dev tool: dump the exact labeled tuples for a synthetic url, for pinning
  * into the golden spec.
  */
object GoldenDump {
  def main(args: Array[String]): Unit = {
    val i = args.headOption.map(_.toLong).getOrElse(3L)
    val p = WebCorpus.page(i)
    val doc = Extraction.extractOne(PageRow(p.url, p.warc_ts, p.html, p.text, p.lang))
    println(s"url = ${doc.url}")
    println(s"sha = ${doc.text_sha256}")
    println(s"n_tokens = ${doc.n_tokens}; simhash = ${doc.simhash}L")
    doc.labels.foreach(l =>
      println(s"""("${l.label}", ${l.start}, ${l.end}, "${l.text.replace("\"", "\\\"")}", "${l.normalized}"),"""))
  }
}
