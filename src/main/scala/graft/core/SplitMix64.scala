package graft.core

/** The single shared splitmix64 step (Steele et al., "Fast Splittable
  * Pseudorandom Number Generators", OOPSLA'14). Every deterministic seed
  * stream in the engine (fingerprint permutations, corpus RNG, LSH
  * hyperplanes, simhash word finalization) uses exactly this mix so
  * cross-component determinism has one definition.
  */
object SplitMix64 {
  final val Golden = 0x9e3779b97f4a7c15L

  /** Finalization mix of an (already advanced) state. */
  @inline def mix(state: Long): Long = {
    var z = state
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
