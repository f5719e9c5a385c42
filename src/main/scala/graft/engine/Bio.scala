package graft.engine

import graft.core.Span

/** S7 BIO-scheme export (data.py:2022-2046, utils.py:199-255): emit one
  * (token, tag) row per token; tag = B-label for the first token inside a
  * labeled span, I-label for subsequent tokens, O outside.
  */
object Bio {

  final case class BioToken(index: Int, token: String, tag: String)

  def tag(text: String, tokens: IndexedSeq[Span], labels: Seq[(String, Span)]): Vector[BioToken] = {
    val sorted = labels.sortBy(_._2.start).toIndexedSeq
    val out = Vector.newBuilder[BioToken]
    var li = 0
    var lastLabelIdx = -1
    tokens.zipWithIndex.foreach { case (tok, i) =>
      while (li < sorted.length && sorted(li)._2.end <= tok.start) li += 1
      // OVERLAP, not full containment: the reference tokenizes each
      // annotation's own slice (utils.py:230-247), so a word straddling an
      // annotation boundary still yields a B-/I- row there — a containment
      // test would silently drop any annotation whose boundary falls
      // mid-token (punctuation-attached tokens are the normal case). For a
      // pre-tokenized stream, tagging the overlapping token is the
      // faithful equivalent; offsets are identical whenever annotations
      // align to token boundaries.
      val tag =
        if (li < sorted.length && sorted(li)._2.start < tok.end && tok.start < sorted(li)._2.end) {
          val t = if (lastLabelIdx == li) s"I-${sorted(li)._1}" else s"B-${sorted(li)._1}"
          lastLabelIdx = li
          t
        } else "O"
      out += BioToken(i, text.substring(tok.start, tok.end), tag)
    }
    out.result()
  }
}
