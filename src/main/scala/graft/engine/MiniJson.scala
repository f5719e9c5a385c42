package graft.engine

/** Minimal JSON parser for the reference's offline fixture files (plain
  * `json.dumps` output): the fixture-source parser (S1/S2 offline project load), zero dependencies. Supports
  * objects, arrays, strings, numbers, booleans, null.
  */
object MiniJson {
  sealed trait V
  final case class JObj(m: Map[String, V]) extends V
  final case class JArr(a: Vector[V]) extends V
  final case class JStr(s: String) extends V
  final case class JNum(d: Double) extends V
  final case class JBool(b: Boolean) extends V
  case object JNull extends V

  def parse(s: String): V = {
    val p = new P(s)
    val v = p.value()
    p.ws()
    v
  }

  private final class P(s: String) {
    var i = 0
    def ws(): Unit = while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
    def expect(c: Char): Unit = {
      ws()
      require(i < s.length && s.charAt(i) == c, s"expected '$c' at $i, got '${s.charAt(math.min(i, s.length - 1))}'")
      i += 1
    }
    def value(): V = {
      ws()
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(str())
        case 't' => i += 4; JBool(true)
        case 'f' => i += 5; JBool(false)
        case 'n' => i += 4; JNull
        case _ => num()
      }
    }
    def obj(): JObj = {
      expect('{'); ws()
      val b = Map.newBuilder[String, V]
      if (s.charAt(i) == '}') { i += 1; return JObj(b.result()) }
      var more = true
      while (more) {
        ws()
        val k = str()
        expect(':')
        b += (k -> value())
        ws()
        if (s.charAt(i) == ',') i += 1 else more = false
      }
      expect('}')
      JObj(b.result())
    }
    def arr(): JArr = {
      expect('['); ws()
      val b = Vector.newBuilder[V]
      if (s.charAt(i) == ']') { i += 1; return JArr(b.result()) }
      var more = true
      while (more) {
        b += value()
        ws()
        if (s.charAt(i) == ',') i += 1 else more = false
      }
      expect(']')
      JArr(b.result())
    }
    def str(): String = {
      expect('"')
      val sb = new java.lang.StringBuilder
      while (s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          s.charAt(i) match {
            case 'n' => sb.append('\n'); case 't' => sb.append('\t')
            case 'r' => sb.append('\r'); case 'b' => sb.append('\b')
            case 'f' => sb.append('\f'); case '/' => sb.append('/')
            case '"' => sb.append('"'); case '\\' => sb.append('\\')
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case other => sb.append(other)
          }
        } else sb.append(c)
        i += 1
      }
      i += 1
      sb.toString
    }
    def num(): JNum = {
      val start = i
      while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
      JNum(s.substring(start, i).toDouble)
    }
  }

  // convenience accessors
  def obj(v: V): Map[String, V] = v.asInstanceOf[JObj].m
  def arr(v: V): Vector[V] = v.asInstanceOf[JArr].a
  def str(v: V): String = v.asInstanceOf[JStr].s
  def num(v: V): Double = v match { case JNum(d) => d; case JNull => Double.NaN; case x => throw new IllegalArgumentException(x.toString) }
  def int(v: V): Int = num(v).toInt
}
