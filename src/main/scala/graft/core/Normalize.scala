package graft.core

/** Data-type-aware scalar normalization (engine type system).
  *
  * Behavior mirrors the reference semantics of konfuzio_sdk/normalize.py
  * (see /root/reference/konfuzio_sdk/normalize.py:12-667): German/English
  * number formats, percentage scaling, positional date formats with century
  * pivot, DE/EN yes/no words, Roman numerals. All functions are total
  * (`Option` results) and allocation-light so they can run inside
  * `mapPartitions` on the hot path without UDF overhead.
  */
object Normalize {

  private val RomanNums: Map[Char, Int] =
    Map('M' -> 1000, 'D' -> 500, 'C' -> 100, 'L' -> 50, 'X' -> 10, 'V' -> 5, 'I' -> 1)

  /** Python `str.isdecimal` equivalent (false for empty). */
  private def isDec(s: String): Boolean = s.nonEmpty && s.forall(Character.isDigit)

  /** `all(x.isdecimal() for x in s.split('.'))` — empty parts fail. */
  private def dotPartsDecimal(s: String): Boolean = s.split("\\.", -1).forall(isDec)

  private def countOf(s: String, c: Char): Int = {
    var i = 0; var n = 0
    while (i < s.length) { if (s.charAt(i) == c) n += 1; i += 1 }
    n
  }

  /** Sign detection: single '-'/'–', trailing 'S', or parenthesized amount
    * (reference: normalize.py:12-37).
    */
  private[core] def isNegative(s: String): Boolean = {
    var neg = false
    val dashes = countOf(s, '-'); val enDashes = countOf(s, '–')
    if ((dashes > 0 || enDashes > 0) && (dashes == 1 || enDashes == 1)) neg = true
    val sCount = countOf(s, 'S')
    if (sCount == 1 && s.nonEmpty && s.charAt(s.length - 1) == 'S' && !neg) neg = true
    val cleaned = s.replace(" ", "").replace("\"", "").replace("„", "")
      .replace("+", "").replace("-", "").replace("–", "").replace("€", "")
    if (cleaned.length > 2 && cleaned.head == '(' && cleaned.last == ')') neg = true
    neg
  }

  private val ZeroForms = Set("-", "-,-", "-,--", "--,--", "--,-", "-.-", "-.--", "--.--", "--.-")
  private val WordNumbers: Map[String, Double] = Map(
    "nil" -> 0, "kein" -> 0, "keinen" -> 0, "keiner" -> 0, "none" -> 0,
    "ein" -> 1, "eine" -> 1, "einer" -> 1, "one" -> 1,
    "zwei" -> 2, "two" -> 2, "drei" -> 3, "three" -> 3, "vier" -> 4, "four" -> 4,
    "fünf" -> 5, "five" -> 5, "sechs" -> 6, "six" -> 6, "sieben" -> 7, "seven" -> 7,
    "acht" -> 8, "eight" -> 8, "neun" -> 9, "nine" -> 9, "zehn" -> 10, "ten" -> 10,
    "elf" -> 11, "eleven" -> 11, "zwölf" -> 12, "twelve" -> 12,
  )

  private def parse(s: String): Double = java.lang.Double.parseDouble(s)

  /** Absolute-value float normalization (reference: normalize.py:56-264).
    * The ordered format cascade is the contract — each branch condition must
    * fire in exactly this order to reproduce the reference's outputs.
    * Total: a malformed token that would make the parse throw (the
    * reference's float() raise, swallowed by its normalize() try/except at
    * normalize.py:645-667) yields None.
    */
  def normalizeToAbsoluteFloat(raw: String): Option[Double] =
    try normalizeToAbsoluteFloatUnsafe(raw)
    catch { case _: NumberFormatException => None }

  private def normalizeToAbsoluteFloatUnsafe(raw: String): Option[Double] = {
    if (ZeroForms.contains(raw)) return Some(0.0)
    WordNumbers.get(raw.toLowerCase) match {
      case Some(v) => return Some(v)
      case None =>
    }
    var s = raw
      .replace("O", "0").replace("°", "").replace(":", "").replace("“", "")
      .replace("'", "").replace("/", "").replace(">", "").replace("(", "")
      .replace(")", "").replace("|", "").replace(" ", "").replace("\"", "")
      .replace("„", "").replace("+", "").replace("-", "").replace("–", "")
      .replace("€", "")

    if (s.length > 1 && (s.last == 'S' || s.last == 'H') && Character.isDigit(s.charAt(s.length - 2)))
      s = s.substring(0, s.length - 1)

    val ln = s.length
    var fl: Option[Double] = None
    var norm: Option[Double] = None
    val dotIdx = s.indexOf('.'); val commaIdx = s.indexOf(',')
    val nDots = countOf(s, '.'); val nCommas = countOf(s, ',')

    if (dotIdx >= 0 && nCommas == 1 && commaIdx >= 0 && dotIdx < commaIdx) {
      // 1.234,56
      val t = s.replace(".", "").replace(",", ".")
      if (dotPartsDecimal(t)) fl = Some(parse(t))
    } else if (dotIdx >= 0 && commaIdx >= 0 && commaIdx < dotIdx) {
      // 1,234.56
      val t = s.replace(",", "")
      if (dotPartsDecimal(t)) fl = Some(parse(t))
    } else if (ln > 6 && nCommas == 2 && nDots == 0 && s.charAt(ln - 3) == ',' && s.charAt(ln - 7) == ',') {
      // 1,234,56
      val t = (s.substring(0, ln - 3) + "." + s.substring(ln - 2)).replace(",", "")
      if (dotPartsDecimal(t)) fl = Some(parse(t))
    } else if (ln > 6 && nDots >= 2 && s.charAt(ln - 3) == '.' && s.charAt(ln - 7) == '.') {
      // 1.234.56 — guard near-all-dot inputs ("......." matches this
      // branch's shape but flattens below 2 chars)
      val flat = s.replace(".", "")
      if (flat.length >= 2) {
        val t = flat.substring(0, flat.length - 2) + "." + flat.substring(flat.length - 2)
        if (dotPartsDecimal(t)) fl = Some(parse(t))
      }
    } else if (ln > 5 && nDots == 2 && s.last == '.' && s.charAt(ln - 5) == '.') {
      // 1.967.
      val t = s.replace(".", "")
      if (isDec(t)) fl = Some(parse(t))
    } else if (ln > 7 && nDots >= 2 && s.charAt(ln - 4) == '.' && s.charAt(ln - 8) == '.') {
      // 1.234.567
      val t = s.replace(".", "")
      if (isDec(t)) fl = Some(parse(t))
    } else if (ln > 7 && nCommas == 2 && s.charAt(ln - 3) == ',' && s.charAt(ln - 7) == ',') {
      // 3.456,814,75
      val t = s.replace(",", "").replace(".", "")
      if (isDec(t)) fl = Some(parse(t) / 100.0)
    } else if (ln > 7 && nCommas == 2 && s.charAt(ln - 4) == ',' && s.charAt(ln - 8) == ',') {
      // 1,234,567
      val t = s.replace(",", "")
      if (isDec(t)) fl = Some(parse(t))
    } else if (commaIdx >= 0 && ln - commaIdx == 3 && isDec(s.replace(",", ""))) {
      // 12,34
      val t = s.replace(",", ".")
      if (dotPartsDecimal(t)) fl = Some(parse(t))
    } else if (nDots == 1 && ln - dotIdx == 3) {
      // 12.34
      if (dotPartsDecimal(s)) fl = Some(parse(s))
    } else if (commaIdx >= 0 && ln - commaIdx == 2 && isDec(s.replace(",", ""))) {
      // 12,3
      fl = Some(parse(s.replace(",", ".")))
    } else if (nDots == 1 && ln - dotIdx == 2) {
      // 12.3
      if (dotPartsDecimal(s)) fl = Some(parse(s))
    } else if (ln > 0 && commaIdx >= 0 && ln - commaIdx == 4 && isDec(s.replace(",", "")) && s.head != ',') {
      // 500,000
      norm = Some(math.abs(parse(s.replace(",", ""))))
    } else if (ln > 4 && dotIdx >= 0 && s.charAt(ln - 4) == '.' && isDec(s.replace(".", "")) && nDots == 1) {
      // 500.000
      norm = Some(math.abs(parse(s.replace(".", ""))))
    } else if (isDec(s)) {
      // 5000
      norm = Some(math.abs(parse(s)))
    } else if (ln > 3 && s.indexOf(';') >= 0 && commaIdx >= 0 && s.charAt(ln - 3) == ';' && s.charAt(ln - 4) == ',') {
      // 159,;03
      val t = s.replace(",", ".").replace(";", "")
      if (dotPartsDecimal(t)) fl = Some(parse(t))
    } else if (ln > 2 && s.head == '‚' && s.charAt(ln - 3) == ',') {
      // ‚22,95
      val t = s.substring(1).replace(",", ".")
      if (dotPartsDecimal(t)) fl = Some(parse(t))
    } else if (s.forall(RomanNums.contains)) {
      norm = romanToFloat(s)
    }

    fl.foreach(v => norm = Some(math.abs(v)))
    norm match {
      case Some(v) if java.lang.Float.isInfinite(v.toFloat) => None // >float32 guard
      case other => other
    }
  }

  /** `Positive Number` normalization — sign ignored (normalize.py:51-53). */
  def normalizeToPositiveFloat(s: String): Option[Double] = normalizeToAbsoluteFloat(s)

  /** `Number` normalization — absolute value with detected sign (normalize.py:40-48).
    * Note the reference only applies the sign to non-zero truthy results.
    */
  def normalizeToFloat(s: String): Option[Double] =
    normalizeToAbsoluteFloat(s).map { v =>
      if (v != 0.0 && isNegative(s)) -v else v
    }

  /** `Percentage` → [0,1] with /100 when '%' present or value > 1
    * (normalize.py:267-289). Rounded half-even to 6 decimals like the
    * reference's `round(res, 6)`.
    */
  def normalizeToPercentage(raw: String): Option[Double] = {
    var s = raw.replace(" ", "").replace("+", "").replace("-", "").replace("\"", "").replace("„", "")
    if (s.length > 1 && (s.last == '.' || s.last == ';' || s.last == ','))
      s = s.substring(0, s.length - 1)
    val pct = s.indexOf('%') >= 0
    if (pct) s = s.replace("%", "")
    normalizeToAbsoluteFloat(s) match {
      case None => None
      case Some(v0) =>
        val v = if (pct || v0 > 1) v0 / 100 else v0
        if (v < 0) None
        else Some(BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble)
    }
  }

  // Month replacement table: insertion order is load-bearing (normalize.py:308-350):
  // long forms first so e.g. "JANUARY" is consumed by "JANUAR"+"Y" only after
  // the long-form pass, then short forms.
  private val MonthTable: Vector[(String, String)] = Vector(
    "JANUAR" -> "01.", "JANUARY" -> "01.", "FEBRUAR" -> "02.", "FEBRUARY" -> "02.",
    "MÄRZ" -> "03.", "MARCH" -> "03.", "APRIL" -> "04.", "MAI" -> "05.", "MAY" -> "05.",
    "JUNI" -> "06.", "JUNE" -> "06.", "JULI" -> "07.", "JULY" -> "07.", "AUGUST" -> "08.",
    "SEPTEMBER" -> "09.", "OKTOBER" -> "10.", "NOVEMBER" -> "11.", "DEZEMBER" -> "12.",
    "DECEMBER" -> "12.",
    "JAN" -> "01.", "FEB" -> "02.", "MAR" -> "03.", "APR" -> "04.", "JUN" -> "06.",
    "JUL" -> "07.", "AUG" -> "08.", "SEP" -> "09.", "OCT" -> "10.", "OKT" -> "10.",
    "NOV" -> "11.", "DEC" -> "12.", "DEZ" -> "12.",
  )

  /** Validate a DD.MM.YYYY candidate (normalize.py:580-600). */
  private def finalDateCheck(d: String): Option[String] = {
    if (d == null) return None
    val shapeOk = d.length == 10 && d.charAt(2) == '.' && d.charAt(5) == '.' &&
      isDec(d.substring(6)) && isDec(d.substring(0, 2)) && isDec(d.substring(3, 5))
    if (!shapeOk) return None
    val y = d.substring(6).toInt; val day = d.substring(0, 2).toInt; val m = d.substring(3, 5).toInt
    if ((((1900 < y) && (y < 2100)) || y == 0) && day < 32 && m < 13) Some(d) else None
  }

  /** Dates that contain a day (normalize.py:370-522). Returns DD.MM.YYYY. */
  private def datesWithDayCount(in: String, orgStr: String): Option[String] = {
    var s = in
    if (s.length < 4) return None
    if (s.length > 4 && ((s.charAt(1) == '.' && s.charAt(4) == '.') || (s.charAt(1) == '/' && s.charAt(4) == '/')))
      s = "0" + s
    val noWs = s.replace(" ", "")
    val noDots = s.replace(".", "")

    if (noDots.length == 6 && (s.length > 2 && s.charAt(2) == '.' || s.length >= 3 && s.charAt(s.length - 3) == '.')) {
      // 0101.01 or 01.0101
      s = noDots.substring(0, 2) + "." + noDots.substring(2, 4) + "." + noDots.substring(4, 6)
    } else if (s.length == 6 && isDec(s)) {
      // 010101
      s = s.substring(0, 2) + "." + s.substring(2, 4) + "." + s.substring(4, 6)
    } else if (noDots.length == 8 && (s.charAt(2) == '.' || s.charAt(s.length - 5) == '.')) {
      // 01.012001 or 0101.2001
      s = noDots.substring(0, 2) + "." + noDots.substring(2, 4) + "." + noDots.substring(4, 8)
    } else if (s.length == 8 && isDec(s)) {
      // 01012001
      s = s.substring(0, 2) + "." + s.substring(2, 4) + "." + s.substring(4, 8)
    } else if (s.head == '/') {
      s = s.substring(1)
    } else if (s.last == '/' && !Character.isDigit(s.charAt(s.length - 2))) {
      s = s.substring(0, s.length - 1)
    } else if (s.last == '.' && s.length == 5 && isDec(s.substring(0, 4))) {
      // 0101.
      s = s.substring(0, 2) + "." + s.substring(2)
    } else if (s.length == 4 && isDec(s) && countOf(s, ',') == 2) {
      s = s.substring(0, 2) + "." + s.substring(2) + "."
    } else if (noWs.length == 13 && noWs.substring(0, 6) == noWs.substring(7, 13) && !Character.isDigit(noWs.charAt(6))) {
      // 01.01/01.01
      s = noWs.substring(0, 6)
    } else if (s.length >= 17 && isDec(s.substring(0, 4)) && isDec(s.substring(5, 7)) && isDec(s.substring(8, 10))) {
      // 1993-02-05T00:00:00
      s = s.substring(0, 10)
    }

    var translation: Option[String] =
      if (s.length == 10 && s.charAt(4) == '-' && s.charAt(7) == '-') {
        // 2001-01-01
        Some(s.substring(8, 10) + "." + s.substring(5, 7) + "." + s.substring(0, 4))
      } else if (s.length == 10 && s.charAt(2) == '.' && s.charAt(5) == '.') {
        Some(s)
      } else if (s.length == 10 && s.charAt(2) == '/' && s.charAt(5) == '/') {
        Some(s.replace("/", "."))
      } else if (s.length == 10 && s.charAt(2) == '-' && s.charAt(5) == '-') {
        Some(s.replace("-", "."))
      } else if (s.length == 8 && s.charAt(2) == '.' && s.charAt(5) == '.' && isDec(s.substring(6))) {
        // 01.01.01 — century pivot: >50 → 19xx else 20xx
        val cent = if (s.substring(6).toInt > 50) "19" else "20"
        Some(s.substring(0, 6) + cent + s.substring(6))
      } else if (s.length == 8 && s.charAt(2) == '/' && s.charAt(5) == '/' && isDec(s.substring(6))) {
        val cent = if (s.substring(6).toInt > 50) "19" else "20"
        Some((s.substring(0, 6) + cent + s.substring(6)).replace("/", "."))
      } else if (s.length == 5 && s.charAt(2) == '.') {
        Some(s + ".0000") // 01.01 → year zero sentinel
      } else if (s.length == 6 && s.charAt(2) == '.' && s.charAt(5) == '.') {
        Some(s + "0000")
      } else if (s.length == 10 && s.charAt(7) == '-' && s.charAt(4) == '-') {
        Some(s.substring(8) + "." + s.substring(5, 7) + "." + s.substring(0, 4))
      } else None

    translation = translation.flatMap(finalDateCheck)

    if (translation.isEmpty && orgStr.length >= 4) {
      // 'July 1, 2019' style: trailing 4-char year, leading day, month word.
      val year = orgStr.substring(orgStr.length - 4)
      var str = orgStr.substring(0, orgStr.length - 4)
      var month: Option[String] = None
      MonthTable.find { case (k, _) => str.toUpperCase.contains(k) } match {
        case Some((k, v)) => str = str.toUpperCase.replace(k, ""); month = Some(v)
        case None =>
      }
      val day = str.toIntOption
      (day, month) match {
        case (Some(d), Some(m)) if d != 0 && year.nonEmpty =>
          var t = d.toString + "." + m + year
          if (d.toString.length < 2) t = "0" + t
          translation = finalDateCheck(t)
        case _ =>
      }
    }
    translation
  }

  /** Month+year-only dates (normalize.py:525-572). */
  private def datesMonthYearOnly(s: String): Option[String] = {
    if (s.length < 5) return None
    var translation: Option[String] = None
    if (s.charAt(s.length - 3) == '/' && countOf(s, '/') == 1 && isDec(s.replace("/", "")) && s.replace("/", "").length == 4) {
      // 09/18
      val cent = if (s.substring(s.length - 2).toInt > 50) "19" else "20"
      translation = Some(s.substring(0, 2) + "." + cent + s.substring(s.length - 2))
    }
    if (translation.isEmpty && s.length < 6) return None
    if (translation.isEmpty) {
      if (s.charAt(s.length - 5) == '.' && countOf(s, '.') == 1 && isDec(s.replace(".", "")) && s.replace(".", "").length == 6) {
        translation = Some(s) // 09.2002
      } else if (s.charAt(s.length - 5) == '/' && countOf(s, '/') == 1 && isDec(s.replace("/", "")) && s.replace("/", "").length == 6) {
        translation = Some(s.substring(0, 2) + "." + s.substring(3)) // 09/2002
      }
    }
    translation.flatMap(t => finalDateCheck("01." + t))
  }

  /** `Date` normalization → ISO `YYYY-MM-DD` (normalize.py:292-367). Total
    * (parse surprises → None, mirroring the reference's dispatch catch).
    */
  def normalizeToDate(raw: String): Option[String] =
    try normalizeToDateUnsafe(raw)
    catch { case _: RuntimeException => None }

  private def normalizeToDateUnsafe(raw: String): Option[String] = {
    var s = raw.replace(" ", "").replace(":", "").replace(",", "").replace("[", "")
      .replace("(", "").replace(")", "").replace(";", "").replace("‚", "")
    val orgStr = s
    // uppercase once (the per-key re-uppercasing in the reference is
    // idempotent); skip the month cascade entirely for letter-free inputs —
    // String.replace is allocation-free on a miss, but 30+ toUpperCase
    // calls per token were the extraction hot path's allocation storm.
    s = s.toUpperCase
    if (s.exists(c => Character.isLetter(c))) {
      for ((k, v) <- MonthTable) s = s.replace(k, v)
    }
    var translation = if (s.isEmpty) None else datesWithDayCount(s, orgStr)
    if (translation.isEmpty) translation = datesMonthYearOnly(s)
    if (translation.isEmpty && isDec(s) && s.length == 4)
      translation = finalDateCheck("01.01." + s)
    translation.map(t => t.substring(6) + "-" + t.substring(3, 5) + "-" + t.substring(0, 2))
  }

  private val NoWords = Vector("NEIN", "NICHT", "KEIN", "OHNE", "NO")
  private val YesWords = Vector("VORHANDEN", "JA", "MIT", "YES")

  /** `True/False` normalization — first word of 1-2-word strings carries the
    * decision (normalize.py:603-623).
    */
  def normalizeToBool(raw: String): Option[Boolean] = {
    val words = raw.toUpperCase.split("\\s+").filter(_.nonEmpty)
    if (words.length == 1 || words.length == 2) {
      val y = YesWords.exists(words(0).contains)
      val n = NoWords.exists(words(0).contains)
      if (y && !n) Some(true) else if (!y && n) Some(false) else None
    } else None
  }

  /** Roman numeral → float (normalize.py:626-642). */
  def romanToFloat(raw: String): Option[Double] = {
    if (raw.isEmpty) return None
    val in = raw.toUpperCase
    if (!in.forall(RomanNums.contains)) return None
    var sum = 0
    var i = 0
    while (i < in.length) {
      val v = RomanNums(in.charAt(i))
      if (i + 1 < in.length && RomanNums(in.charAt(i + 1)) > v) sum -= v else sum += v
      i += 1
    }
    Some(sum.toDouble)
  }

  /** Dispatch by label data type (normalize.py:645-667). Returns the
    * normalized value boxed as Any (Double / String / Boolean) or None.
    */
  def normalize(s: String, dataType: String): Option[Any] =
    // the reference's dispatch swallows EVERY exception to None
    // (normalize.py:645-667) — on the extraction hot path a pathological
    // token must normalize to nothing, not kill the Spark task
    try dataType match {
      case "Positive Number" | "float_positive" => normalizeToPositiveFloat(s)
      case "Number" | "float" => normalizeToFloat(s)
      case "Date" | "date" => normalizeToDate(s)
      case "True/False" | "bool" => normalizeToBool(s)
      case "Percentage" | "percentage" => normalizeToPercentage(s)
      case "Text" | "str" => Some(s)
      case _ => None
    } catch { case scala.util.control.NonFatal(_) => None }
}
