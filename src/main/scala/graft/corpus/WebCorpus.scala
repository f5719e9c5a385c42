package graft.corpus

import java.sql.Timestamp
import scala.util.hashing.MurmurHash3

/** Deterministic synthetic Common-Crawl-style page generator.
  *
  * Produces rows of the engine input shape `(url, warc_ts, html, text, lang)`
  * — the BASELINE input_hint schema — at any scale, seeded per url so a row's
  * bytes are identical regardless of partitioning, ordering, or cluster size.
  * `mainText(url)` is the golden main-content the generator embeds; the HTML
  * wraps it in boilerplate (nav/footer/sidebar with high link density) that
  * the extractor must strip. Tests assert `Html.extract(html).text ==
  * mainText(url)` byte-identically.
  */
object WebCorpus {

  final case class Page(url: String, warc_ts: Timestamp, html: Array[Byte], text: String, lang: String)

  private val contentWords = Vector(
    "invoice", "total", "amount", "delivery", "order", "payment", "customer", "service",
    "market", "report", "quarterly", "revenue", "growth", "supply", "index", "table",
    "analysis", "result", "summary", "annual", "statement", "balance", "figure", "price",
    "percent", "contract", "agreement", "partner", "product", "release", "update", "research")
  private val navWords = Vector("home", "about", "contact", "login", "register", "privacy",
    "terms", "sitemap", "careers", "press", "blog", "shop", "support", "faq")
  private val langs = Vector("en", "de", "fr", "es")

  /** Deterministic per-(url, salt) PRNG — a pure function of the url. */
  private final class Rng(url: String, salt: Int) {
    private var state: Long = {
      val h = MurmurHash3.stringHash(url, 0x5eed + salt)
      (h.toLong << 32) ^ MurmurHash3.stringHash(url, 0xc0ffee + salt).toLong
    }
    def nextLong(): Long = {
      state += graft.core.SplitMix64.Golden
      graft.core.SplitMix64.mix(state)
    }
    def nextInt(bound: Int): Int = (math.floorMod(nextLong(), bound.toLong)).toInt
    def pick[T](v: Vector[T]): T = v(nextInt(v.length))
  }

  def urlFor(i: Long): String = {
    // skewed host distribution: host id ~ i mod zipf-ish buckets, so a few
    // hosts carry most pages (exercises salting / skew handling)
    val host =
      if (i % 10 < 4) "big-portal-0"
      else if (i % 10 < 6) "big-portal-1"
      else s"site-${i % 997}"
    s"https://$host.example.com/page/$i"
  }

  /** One content sentence (7-14 words, deterministic). */
  private def sentence(r: Rng): String = {
    val n = 7 + r.nextInt(8)
    val sb = new StringBuilder
    var j = 0
    while (j < n) {
      val w = r.pick(contentWords)
      if (j == 0) { sb.append(Character.toUpperCase(w.charAt(0))).append(w.substring(1)) }
      else sb.append(w)
      // sprinkle extractable entities: dates, amounts, percentages
      if (j == 1 && r.nextInt(9) == 0) sb.append(" https://ref.example.com/doc/").append(r.nextInt(1000))
      if (j == 2 && r.nextInt(6) == 0) sb.append(" R&D")
      if (j == 4 && r.nextInt(8) == 0) sb.append(" contact").append(r.nextInt(100)).append("@corp.example.com")
      if (j == 3 && r.nextInt(4) == 0) sb.append(" ").append(f"${1 + r.nextInt(28)}%02d.${1 + r.nextInt(12)}%02d.${1995 + r.nextInt(30)}")
      if (j == 5 && r.nextInt(4) == 0) sb.append(" ").append(s"${r.nextInt(9000) + 100},${10 + r.nextInt(89)} EUR")
      if (j == 6 && r.nextInt(5) == 0) sb.append(" ").append(s"${r.nextInt(99)},${10 + r.nextInt(89)} %")
      if (j < n - 1) sb.append(' ')
      j += 1
    }
    sb.append('.')
    sb.toString
  }

  /** The golden main content for a url — paragraphs joined by `\n`. */
  def mainText(url: String): String = {
    val r = new Rng(url, 1)
    val nPara = 2 + r.nextInt(5)
    val paras = Vector.tabulate(nPara) { _ =>
      val nSent = 2 + r.nextInt(4)
      Vector.fill(nSent)(sentence(r)).mkString(" ")
    }
    val heading = {
      val r2 = new Rng(url, 2)
      s"Report ${r2.pick(contentWords)} ${r2.pick(contentWords)} overview summary for ${r2.pick(contentWords)} analysis"
    }
    (heading +: paras).mkString("\n")
  }

  private def navBlock(r: Rng, n: Int): String =
    (0 until n).map(_ => s"""<a href="/${r.pick(navWords)}">${r.pick(navWords)}</a>""").mkString(" | ")

  /** Full page HTML embedding [[mainText]] plus link-dense boilerplate. */
  def htmlFor(url: String): String = {
    val r = new Rng(url, 3)
    val main = mainText(url)
    val parts = main.split("\n")
    val heading = parts.head
    val paras = parts.tail
    val sb = new StringBuilder
    sb.append("<!DOCTYPE html>\n<html>\n<head>\n")
    sb.append(s"<title>${heading.take(40)}</title>\n")
    sb.append("<meta charset=\"utf-8\">\n<style>body{margin:0}</style>\n")
    sb.append("<script>var t=1;</script>\n</head>\n<body>\n")
    sb.append("<header><nav>").append(navBlock(r, 6 + r.nextInt(5))).append("</nav></header>\n")
    sb.append("<div class=\"sidebar\"><ul>\n")
    for (_ <- 0 until 3 + r.nextInt(4))
      sb.append(s"""<li><a href="/${r.pick(navWords)}">${r.pick(navWords)} ${r.pick(navWords)}</a></li>\n""")
    sb.append("</ul></div>\n<article>\n")
    sb.append(s"<h1>${heading}</h1>\n")
    paras.foreach { p =>
      // encode '&' as entity in source to exercise the decoder; the golden
      // text contains the decoded form
      sb.append("<p>").append(p.replace("&", "&amp;")).append("</p>\n")
    }
    sb.append("</article>\n")
    sb.append("<footer>").append(navBlock(r, 4 + r.nextInt(4)))
    sb.append(s"<p>© 2026 ${r.pick(navWords)} inc <a href=\"/x\">${r.pick(navWords)}</a></p>")
    sb.append("</footer>\n</body>\n</html>\n")
    sb.toString
  }

  def page(i: Long): Page = {
    val url = urlFor(i)
    val r = new Rng(url, 4)
    val ts = new Timestamp(1700000000000L + (math.floorMod(r.nextLong(), 31536000L)) * 1000L)
    val html = htmlFor(url).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    Page(url, ts, html, "", langs(r.nextInt(langs.length)))
  }
}
