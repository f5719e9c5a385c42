package graft.engine

/** S6 model persistence (replaces the reference's cloudpickle/bz2 artifact,
  * information_extraction.py:1943-2013): scorer label config as a small JSON
  * document — written once, broadcast at inference. Hand-rolled JSON (fixed
  * schema, zero deps), round-trip-exact.
  */
object ModelStore {

  final case class Model(labels: Vector[LabelDef])

  val default: Model = Model(Labels.all)

  private def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }

  def toJson(m: Model): String =
    m.labels.map { l =>
      s"""{"name":"${esc(l.name)}","dataType":"${esc(l.dataType)}","threshold":${l.threshold},""" +
        s""""hasMultipleTopCandidates":${l.hasMultipleTopCandidates},"multiline":${l.multiline}}"""
    }.mkString("""{"labels":[""", ",", "]}")

  /** Real JSON parse (MiniJson handles the escapes esc() writes) — a regex
    * scraper silently DROPPED labels whose names contain quotes and
    * returned still-escaped names for backslashes, and corrupt input
    * yielded an empty model with no diagnostic instead of an error.
    */
  def fromJson(json: String): Model = {
    import MiniJson._
    val root = obj(parse(json))
    val labels = arr(root.getOrElse("labels",
      throw new IllegalArgumentException("model JSON has no 'labels' field")))
    Model(labels.map { v =>
      val o = obj(v)
      def bool(k: String): Boolean = o(k).asInstanceOf[JBool].b
      LabelDef(str(o("name")), str(o("dataType")), num(o("threshold")),
        bool("hasMultipleTopCandidates"), bool("multiline"))
    })
  }

  def save(m: Model, path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), toJson(m))

  def load(path: String): Model =
    fromJson(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
}
