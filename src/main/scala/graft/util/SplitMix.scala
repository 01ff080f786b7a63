package graft.util

/** SplitMix64 index mixing (public-domain constants) — the single source
  * of the deterministic pseudo-randomness behind the minhash permutation
  * constants and the LSH hyperplanes. Callers apply their own range
  * reduction; keeping the raw mix here means regenerating one family of
  * constants cannot silently diverge from the other.
  */
object SplitMix {
  def mix(i: Long): Long = {
    var z = i * 0x9E3779B97F4A7C15L + 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0x94D049BB133111EBL
    z ^ (z >>> 27)
  }
}
