package graft.core

import org.scalatest.funsuite.AnyFunSuite

class UrlOpsSpec extends AnyFunSuite {

  test("scheme and host lowercase, default ports stripped, fragment dropped") {
    assert(UrlOps.canonicalize("HTTPS://WWW.Example.COM:443/Path/X#frag") ==
      "https://www.example.com/Path/X")
    assert(UrlOps.canonicalize("http://Host.Org:80/") == "http://host.org/")
    assert(UrlOps.canonicalize("http://host.org:8080/a") == "http://host.org:8080/a")
    assert(UrlOps.canonicalize("https://h.io:80/a") == "https://h.io:80/a",
      "80 is not https' default port")
  }

  test("path case preserved; empty path becomes /") {
    assert(UrlOps.canonicalize("https://h.io") == "https://h.io/")
    assert(UrlOps.canonicalize("https://h.io?a=1") == "https://h.io/?a=1")
    assert(UrlOps.canonicalize("https://h.io/CaseKept") == "https://h.io/CaseKept")
  }

  test("tracking params stripped, remaining sorted, empty query dropped") {
    assert(UrlOps.canonicalize("https://h.io/p?utm_source=feed&b=2&a=1") ==
      "https://h.io/p?a=1&b=2")
    assert(UrlOps.canonicalize("https://h.io/p?gclid=x&fbclid=y&utm_medium=m") ==
      "https://h.io/p")
    assert(UrlOps.canonicalize("https://h.io/p?z=9&a=1#s") == "https://h.io/p?a=1&z=9")
  }

  test("non-URL inputs pass through; host helpers") {
    assert(UrlOps.canonicalize("not a url") == "not a url")
    assert(UrlOps.host("HTTPS://WWW.Ex.COM:443/a") == "www.ex.com")
    assert(UrlOps.host("nope") == "")
    assert(UrlOps.dedupHost("https://www.ex.com/a") == "ex.com")
    assert(UrlOps.dedupHost("https://ex.com/a") == "ex.com")
  }

  test("percent-encoding normalized (RFC 3986 §6.2.2.2)") {
    // unreserved escapes decode
    assert(UrlOps.pctNormalize("%7Efoo") == "~foo")
    assert(UrlOps.pctNormalize("a%41%62%30%2D%2E%5F") == "aAb0-._")
    // reserved escapes keep the escape, hex uppercased
    assert(UrlOps.pctNormalize("a%2fb%3d%26") == "a%2Fb%3D%26")
    // malformed escapes pass through byte-for-byte
    assert(UrlOps.pctNormalize("100%") == "100%")
    assert(UrlOps.pctNormalize("%G1x%2") == "%G1x%2")
    // applied to path and to query components; decode precedes the
    // tracking-param strip and the sort
    assert(UrlOps.canonicalize("https://h.io/%7Euser%2fp%4d") ==
      "https://h.io/~user%2FpM")
    assert(UrlOps.canonicalize("https://h.io/p?%75tm_source=x&b=%31") ==
      "https://h.io/p?b=1")
    assert(UrlOps.canonicalize("https://h.io/p?%7A=1&a=2") ==
      "https://h.io/p?a=2&z=1", "decoded key participates in the sort")
  }

  test("idempotent: canonicalize(canonicalize(u)) == canonicalize(u)") {
    val us = Seq(
      "HTTPS://WWW.Example.COM:443/Path/X?utm_source=s&b=2&a=1#f",
      "http://Host.Org:8080?z=1", "https://h.io", "plain",
      "https://h.io/%7Ea%2fb?%75tm_source=x&k=%4d%2f")
    us.foreach { u =>
      val c = UrlOps.canonicalize(u)
      assert(UrlOps.canonicalize(c) == c, s"not idempotent for $u")
    }
  }
}
