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

  private val labelRe =
    ("""\{"name":"([^"]*)","dataType":"([^"]*)","threshold":([0-9.Ee+-]+),""" +
      """"hasMultipleTopCandidates":(true|false),"multiline":(true|false)\}""").r

  def fromJson(json: String): Model =
    Model(labelRe.findAllMatchIn(json).map { m =>
      LabelDef(m.group(1), m.group(2), m.group(3).toDouble, m.group(4).toBoolean, m.group(5).toBoolean)
    }.toVector)

  def save(m: Model, path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), toJson(m))

  def load(path: String): Model =
    fromJson(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
}
