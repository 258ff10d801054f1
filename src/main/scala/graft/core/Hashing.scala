package graft.core

/** Shared deterministic hash helpers.
  *
  * splitmix64 is the finalizer behind BOTH the MinHash permutation-seed
  * family (graft.ops.Dedup and graft.expressions.MinHashSigExpr must agree
  * bit-for-bit for the documented explode-path equivalence) and VIOD's
  * deterministic sampling rank — one definition, referenced everywhere, so
  * a constant typo can't silently break signature compatibility.
  */
object Hashing {

  /** splitmix64 finalizer (public-domain constants from Steele et al.,
    * "Fast Splittable Pseudorandom Number Generators"). */
  def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Order-free deterministic rank of a double value (by raw IEEE bits) —
    * VIOD's sampling-cap rank. */
  def doubleRank(v: Double): Long =
    splitmix64(java.lang.Double.doubleToLongBits(v))
}
