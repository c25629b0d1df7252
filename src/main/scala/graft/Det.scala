package graft

/** Deterministic, counter-based hashing used for synthetic data
  * generation and term hashing. All randomness in the synthetic pages
  * table derives from `h(seed, i, field)` so the same row is produced
  * at any parallelism (the property that makes rank-identical goldens
  * possible — see FIXTURES.md §1).
  *
  * Ancestor pattern in the reference: deterministic per-entity synthetic
  * fixtures (/root/reference/tests/conftest.py:160-258).
  */
object Det {

  /** SplitMix64 finalizer — high-quality 64-bit mix. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Counter-based hash of (seed, i, field). */
  def h(seed: Long, i: Long, field: Long): Long =
    mix(mix(mix(seed) ^ i) ^ (field * 0x9e3779b97f4a7c15L))

  /** Uniform double in [0, 1) from a hash value. */
  def unit(x: Long): Double = (x >>> 11) * 1.1102230246251565e-16 // 2^-53

  /** Deterministic string hash (FNV-1a 64-bit over UTF-8 bytes).
    * Used where a pure-Scala, engine-independent hash is needed
    * (e.g. cross-checking against an oracle that lacks xxhash64).
    */
  def fnv1a(s: String): Long = {
    var hash = 0xcbf29ce484222325L
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) {
      hash ^= (bytes(i) & 0xffL)
      hash *= 0x100000001b3L
      i += 1
    }
    hash
  }
}
