package graft.engine

import org.scalatest.funsuite.AnyFunSuite

class RedactSpec extends AnyFunSuite {

  test("emails and urls mask; everything else survives byte-for-byte") {
    val in = "Kontakt kunde7@firma.de oder  https://ex.com/a?b=1\nwww.site.org Ende."
    val out = Redact.redactPII(in)
    assert(out == "Kontakt <EMAIL> oder  <URL>\n<URL> Ende.")
  }

  test("near-misses are untouched") {
    val cases = Seq(
      "a@b", // too short, no dot after @
      "not.an.email", // no @
      "http:/broken.example", // malformed scheme
      "wwwnodot", // no www. prefix
      "x@y.z w@v.u") // two real emails
    assert(Redact.redactPII(cases(0)) == "a@b")
    assert(Redact.redactPII(cases(1)) == "not.an.email")
    assert(Redact.redactPII(cases(2)) == "http:/broken.example")
    assert(Redact.redactPII(cases(3)) == "wwwnodot")
    assert(Redact.redactPII(cases(4)) == "<EMAIL> <EMAIL>")
  }

  test("masking agrees with the scorer's labeling") {
    // any token the scorer would label email/url must be masked, and
    // vice versa — the shared-predicate contract
    val text = "mail kunde1@firma.de web www.ex.org rest 12,34"
    val spans = graft.core.Rx.tokenSpans(text, graft.core.Tokenizers.whitespace)
    val masked = Redact.redactPII(text)
    spans.foreach { sp =>
      val tok = text.substring(sp.start, sp.end)
      val labeled = Scorer.scoreToken(text, sp.start, sp.end).map(_.label)
      if (labeled.contains("email")) assert(!masked.contains(tok))
      if (labeled.contains("url")) assert(!masked.contains(tok))
    }
  }

  test("pure and idempotent") {
    val in = "a kunde9@firma.de b"
    assert(Redact.redactPII(Redact.redactPII(in)) == Redact.redactPII(in))
    assert(Redact.redactPII("") == "")
    assert(Redact.redactPII(null) == null)
  }
}
