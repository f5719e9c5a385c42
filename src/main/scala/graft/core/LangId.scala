package graft.core

/** Heuristic language identification: stopword + character n-gram profiles.
  * Deterministic and dependency-free; designed for the web-scale text
  * pipeline's lang column (the reference SDK receives `lang` from its OCR
  * server and never computes it — this is a scale-pipeline addition).
  */
object LangId {

  private val profiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "on", "are", "with", "as", "at", "this", "but", "by", "from", "they", "you", "have", "not", "be"),
    "de" -> Set("der", "die", "das", "und", "ist", "ich", "nicht", "ein", "eine", "mit", "für", "auf", "den", "von", "zu", "sich", "des", "im", "dem", "auch", "es", "an", "werden", "aus"),
    "fr" -> Set("le", "la", "les", "de", "des", "et", "est", "un", "une", "du", "que", "qui", "dans", "pour", "pas", "sur", "au", "avec", "ne", "se", "ce", "il", "sont", "par"),
    "es" -> Set("el", "la", "los", "las", "de", "y", "es", "un", "una", "del", "que", "en", "por", "con", "no", "se", "su", "para", "como", "más", "pero", "sus", "le", "ha"),
    "it" -> Set("il", "la", "di", "che", "e", "è", "un", "una", "per", "non", "sono", "con", "si", "del", "della", "le", "nel", "da", "al", "come", "dei", "anche", "più", "ma"),
    "pt" -> Set("o", "a", "os", "as", "de", "e", "é", "um", "uma", "do", "da", "que", "em", "para", "não", "com", "se", "por", "mais", "dos", "como", "mas", "ao", "das"),
    "nl" -> Set("de", "het", "een", "en", "van", "is", "dat", "op", "te", "zijn", "voor", "met", "die", "niet", "aan", "er", "om", "ook", "als", "maar", "bij", "dan", "uit", "naar"),
  )

  private val tokenSplit = "[^\\p{L}]+"

  /** Score = stopword hits per language over the first `maxTokens` tokens;
    * argmax with lexicographic tie-break; "und" (undetermined) when nothing
    * scores or the text is CJK-dominant ("zh" for Han-dominant text).
    */
  private val orderedProfiles: Vector[(String, Set[String])] = profiles.toVector.sortBy(_._1)

  // one hash lookup per token: word -> bitmask of the (lexicographically
  // ordered) languages whose profile contains it
  private val wordMask: java.util.HashMap[String, Int] = {
    val m = new java.util.HashMap[String, Int]()
    orderedProfiles.zipWithIndex.foreach { case ((_, words), p) =>
      words.foreach(w => m.merge(w, 1 << p, (a, b) => Integer.valueOf(a | b)))
    }
    m
  }

  def detect(text: String, maxTokens: Int = 200): String = {
    if (text == null || text.isEmpty) return "und"
    var han = 0; var total = 0
    var i = 0
    val lim = math.min(text.length, 4000)
    while (i < lim) {
      val c = text.charAt(i)
      // ASCII fast path: UnicodeScript.of is a per-char binary search over
      // the script ranges — never HAN below 0x80, and isLetter is [A-Za-z]
      if (c < 0x80) {
        if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) total += 1
      } else {
        if (Character.UnicodeScript.of(c) == Character.UnicodeScript.HAN) han += 1
        if (Character.isLetter(c)) total += 1
      }
      i += 1
    }
    if (total > 0 && han * 2 > total) return "zh"
    // single bounded scan: lowercased letter-run tokens, stop at maxTokens —
    // no whole-text lowercase + regex split (this runs per document in the
    // extraction hot path); scores accumulate inline
    val scores = new Array[Int](orderedProfiles.length)
    val sb = new java.lang.StringBuilder(24)
    var nTok = 0
    i = 0
    var sawToken = false
    def flush(): Unit = if (sb.length > 0) {
      val tok = sb.toString
      sb.setLength(0)
      nTok += 1
      sawToken = true
      var mask = wordMask.getOrDefault(tok, 0)
      var p = 0
      while (mask != 0) {
        if ((mask & 1) != 0) scores(p) += 1
        mask >>>= 1
        p += 1
      }
    }
    while (i < text.length && nTok < maxTokens) {
      val c = text.charAt(i)
      // ASCII fast path (bit-identical: isLetter below 0x80 is [A-Za-z],
      // toLowerCase is +32 on [A-Z])
      if (c < 0x80) {
        if (c >= 'a' && c <= 'z') sb.append(c)
        else if (c >= 'A' && c <= 'Z') sb.append((c + 32).toChar)
        else flush()
      } else if (Character.isLetter(c)) sb.append(Character.toLowerCase(c))
      else flush()
      i += 1
    }
    if (nTok < maxTokens) flush()
    if (!sawToken) return "und"
    var best = "und"; var bestScore = 0
    var p = 0
    while (p < orderedProfiles.length) {
      if (scores(p) > bestScore) { best = orderedProfiles(p)._1; bestScore = scores(p) }
      p += 1
    }
    best
  }
}
