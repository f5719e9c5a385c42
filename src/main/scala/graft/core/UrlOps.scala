package graft.core

/** URL canonicalization — where web-scale dedup starts: Common-Crawl-style
  * corpora key everything by url, and the same page commonly appears under
  * scheme/host case variants, default ports, tracking parameters, fragment
  * anchors and unordered query strings. Canonicalizing before the exact
  * (hash-groupBy) dedup stage collapses those families without touching
  * the content kernels.
  *
  * Rules (the common subset of the crawler folklore — each is lossless for
  * origin identity except the documented tracking-param strip):
  *   - scheme and host lowercased (RFC 3986 §6.2.2.1)
  *   - default ports stripped (http:80, https:443)
  *   - fragment dropped (never sent to the server)
  *   - tracking query params dropped (utm_*, gclid, fbclid)
  *   - remaining query params sorted lexicographically as whole "k=v"
  *     strings — an order-insensitive canonical form
  *   - empty path → "/"
  *   - path and query VALUES keep their case (case-sensitive per RFC)
  *   - percent-encoding normalized per RFC 3986 §6.2.2.2: escapes of
  *     unreserved characters decode (`%7Efoo` → `~foo`), every remaining
  *     escape's hex uppercases (`%2f` → `%2F`), invalid escapes pass
  *     through untouched — applied to path and query (keys normalized
  *     BEFORE the tracking filter, so `%75tm_source` is still stripped)
  *
  * All case folding uses `Locale.ROOT`: a Turkish-locale JVM's dotless-ı
  * `toLowerCase` would otherwise split canonical keys containing 'I'
  * across executors running under different default locales.
  *
  * Pure Scala, no dependencies; used per-row inside extraction/dedup
  * mapPartitions stages. Inputs without a "://" pass through unchanged
  * (opaque ids stay stable keys).
  */
object UrlOps {

  private def isTracking(key: String): Boolean =
    key.startsWith("utm_") || key == "gclid" || key == "fbclid"

  private def isUnreserved(c: Int): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
      c == '-' || c == '.' || c == '_' || c == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** RFC 3986 §6.2.2.2 percent-encoding normalization: decode escapes of
    * unreserved characters, uppercase the hex digits of every other escape,
    * leave malformed escapes (`%`, `%G1`, truncated) byte-for-byte intact.
    * Only unreserved bytes ever decode, so no delimiter (`%26` = '&',
    * `%3D` = '=', `%2F` = '/') can materialize — the function is safe to
    * apply to a whole path or a whole `k=v` component.
    */
  def pctNormalize(s: String): String = {
    var i = s.indexOf('%')
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var start = 0
    while (i >= 0) {
      sb.append(s, start, i)
      if (i + 2 < s.length && hexVal(s.charAt(i + 1)) >= 0 && hexVal(s.charAt(i + 2)) >= 0) {
        val v = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        if (isUnreserved(v)) sb.append(v.toChar)
        else sb.append('%')
          .append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        start = i + 3
      } else { sb.append('%'); start = i + 1 }
      i = s.indexOf('%', start)
    }
    sb.append(s, start, s.length)
    sb.toString
  }

  /** Lowercased host with any default port stripped; empty when the input
    * is not a scheme://host url.
    */
  def host(url: String): String = {
    val sep = url.indexOf("://")
    if (sep < 0) return ""
    val authStart = sep + 3
    var authEnd = authStart
    while (authEnd < url.length && { val c = url.charAt(authEnd); c != '/' && c != '?' && c != '#' }) authEnd += 1
    val auth = url.substring(authStart, authEnd)
    val colon = auth.lastIndexOf(':')
    val h = if (colon >= 0 && auth.drop(colon + 1).forall(_.isDigit)) auth.substring(0, colon) else auth
    h.toLowerCase(java.util.Locale.ROOT)
  }

  /** `host` with one leading "www." stripped — the grouping key for
    * site-level dedup (www and apex serve the same content in practice).
    */
  def dedupHost(url: String): String = {
    val h = host(url)
    if (h.startsWith("www.")) h.substring(4) else h
  }

  /** Canonical form per the object contract; non-URL inputs unchanged. */
  def canonicalize(url: String): String = {
    val sep = url.indexOf("://")
    if (sep < 0) return url
    val scheme = url.substring(0, sep).toLowerCase(java.util.Locale.ROOT)
    val authStart = sep + 3
    var authEnd = authStart
    while (authEnd < url.length && { val c = url.charAt(authEnd); c != '/' && c != '?' && c != '#' }) authEnd += 1
    val auth = url.substring(authStart, authEnd)
    val colon = auth.lastIndexOf(':')
    val (rawHost, rawPort) =
      if (colon >= 0 && auth.drop(colon + 1).forall(_.isDigit) && colon < auth.length - 1)
        (auth.substring(0, colon), auth.substring(colon + 1))
      else (auth, "")
    val h = rawHost.toLowerCase(java.util.Locale.ROOT)
    val port =
      if (rawPort.isEmpty) ""
      else if (scheme == "http" && rawPort == "80") ""
      else if (scheme == "https" && rawPort == "443") ""
      else ":" + rawPort
    // path ends at '?' or '#'
    var pathEnd = authEnd
    while (pathEnd < url.length && { val c = url.charAt(pathEnd); c != '?' && c != '#' }) pathEnd += 1
    val path = if (pathEnd == authEnd) "/" else pctNormalize(url.substring(authEnd, pathEnd))
    // query ends at '#'
    val query =
      if (pathEnd < url.length && url.charAt(pathEnd) == '?') {
        var qEnd = pathEnd + 1
        while (qEnd < url.length && url.charAt(qEnd) != '#') qEnd += 1
        val kept = url.substring(pathEnd + 1, qEnd).split("&").toIndexedSeq
          .map(pctNormalize) // decode BEFORE the tracking filter and sort
          .filter(p => p.nonEmpty && !isTracking(p.takeWhile(_ != '=')))
          .sorted // canonical order: lexicographic over whole "k=v" strings
        if (kept.isEmpty) "" else kept.mkString("?", "&", "")
      } else ""
    scheme + "://" + h + port + path + query
  }
}
