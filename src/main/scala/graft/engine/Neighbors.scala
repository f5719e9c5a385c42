package graft.engine

import graft.core.Span

/** X4 n-nearest-neighbor context features (information_extraction.py:
  * 1452-1543): for a target span, the n closest tokens to its left and right
  * on the same line, each with its gap distance; padded with ("", 100000).
  * Pure per-document sequential kernel — runs inside mapPartitions.
  *
  * `tokens` must be sorted by start and non-overlapping (the line-tokenizer
  * contract); the lookup is a binary search plus a bounded walk — O(log T +
  * n) per target instead of a full token scan, so featurizing every span of
  * a large document stays linear.
  */
object Neighbors {

  val PadDistance = 100000

  final case class Neighbor(text: String, distance: Int)

  /** Left/right neighbors of `target` among `tokens`. Only same-line tokens
    * qualify (the reference tokenizes the span's line); distance = char gap
    * between spans.
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
    // binary search: first token with start >= target.start
    var lo = 0; var hi = tokens.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (tokens(mid).start < target.start) lo = mid + 1 else hi = mid
    }
    // walk left: non-overlapping sorted tokens yield non-decreasing gaps
    val left = Vector.newBuilder[Neighbor]
    var i = lo - 1
    var taken = 0
    while (i >= 0 && taken < n && tokens(i).start >= lineStart) {
      val t = tokens(i)
      if (t.end <= target.start) { // t.end >= lineStart is implied by the loop guard (end >= start >= lineStart)
        left += Neighbor(text.substring(t.start, t.end), target.start - t.end)
        taken = taken + 1
      }
      i -= 1
    }
    val right = Vector.newBuilder[Neighbor]
    i = lo
    taken = 0
    while (i < tokens.length && taken < n && tokens(i).end <= lineEnd) {
      val t = tokens(i)
      if (t.start >= target.end) {
        right += Neighbor(text.substring(t.start, t.end), t.start - target.end)
        taken = taken + 1
      }
      i += 1
    }
    (left.result().padTo(n, Neighbor("", PadDistance)),
      right.result().padTo(n, Neighbor("", PadDistance)))
  }
}
