package graft.engine

import graft.core.Span

/** X4 n-nearest-neighbor context features (information_extraction.py:
  * 1452-1543): for a target span, the n closest tokens to its left and right
  * on the same line, each with its gap distance; padded with ("", 100000).
  * Pure per-document sequential kernel — runs inside mapPartitions.
  */
object Neighbors {

  val PadDistance = 100000

  final case class Neighbor(text: String, distance: Int)

  /** Left/right neighbors of `target` among `tokens` (sorted by start, same
    * document text). Only same-line tokens qualify (the reference tokenizes
    * the span's line); distance = char gap between spans.
    */
  def nNearest(text: String, tokens: IndexedSeq[Span], target: Span, n: Int): (Vector[Neighbor], Vector[Neighbor]) = {
    val lineStart = {
      var i = target.start
      while (i > 0 && text.charAt(i - 1) != '\n' && text.charAt(i - 1) != '\f') i -= 1
      i
    }
    val lineEnd = {
      var i = target.end
      while (i < text.length && text.charAt(i) != '\n' && text.charAt(i) != '\f') i += 1
      i
    }
    val sameLine = tokens.filter(t => t.start >= lineStart && t.end <= lineEnd && !(t overlaps target))
    val left = sameLine.filter(_.end <= target.start)
      .map(t => Neighbor(text.substring(t.start, t.end), target.start - t.end))
      .sortBy(_.distance).take(n).toVector
    val right = sameLine.filter(_.start >= target.end)
      .map(t => Neighbor(text.substring(t.start, t.end), t.start - target.end))
      .sortBy(_.distance).take(n).toVector
    (left.padTo(n, Neighbor("", PadDistance)), right.padTo(n, Neighbor("", PadDistance)))
  }
}
