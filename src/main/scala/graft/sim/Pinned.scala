package graft.sim

import graft.functions.Hashing

/** Pinned (literal) ANN model state for oracle-checked serving-math
  * queries. Trained k-means codebooks have no closed-form SQL, so the
  * trained ANN paths (q41/q82/q84) are gated by recall specs and
  * registered rows-only — but the SERVING math they run (nearest-centroid
  * assignment, per-subspace code assignment, ADC lookup-table scoring) is
  * plain arithmetic once the codebook is fixed. These generators produce
  * a deterministic pseudo-random codebook both engines can regenerate
  * from the shared polyhash/squareMix primitives (the q99 SRP doctrine),
  * with every component an EXACT binary fraction (multiples of 0.25) so
  * Spark and the DuckDB oracle replay identical IEEE operations.
  *
  * The pinned values are pseudo-random, not trained — recall against
  * these codebooks is meaningless; what the companion queries pin is the
  * assignment/scoring arithmetic the trained paths share (same
  * [[Ivf.nearestCentroid]]/[[Pq.encode]] code runs in both).
  */
object Pinned {

  /** Component for `key`: squareMix(polyHash(key)) mapped to the five
    * exact quarter steps {-0.5, -0.25, 0, 0.25, 0.5}. */
  def value(key: String): Double =
    ((Hashing.squareMix(Hashing.polyHash(key)) % 5) - 2) * 0.25

  /** The salt is CONCATENATED into the key (the oracle CTEs replicate
    * the exact string), so a digit-ending salt would alias with
    * unsalted keys (salt "1", c=2 -> "12:…" == unsalted c=12) — and a
    * colon-bearing salt aliases ACROSS families (salt "3:" turns IVF
    * key "3:"+"c:d" into "3:c:d", a PQ key shape), silently
    * correlating 'independent' codebooks either way. Reject both: the
    * salt may use neither a trailing digit nor the key grammar's own
    * separator. */
  private def checkSalt(salt: String): Unit =
    require(salt.isEmpty ||
        (!salt.last.isDigit && !salt.contains(':')),
      s"pinned-codebook salt must end in a non-digit and contain no " +
        s"':', got: '$salt'")

  /** Pinned IVF codebook: centroid c, dim d -> value("<salt>c:d"). A
    * non-empty `salt` yields a SECOND independent pinned codebook from
    * the same generator — the before/after pair the codebook-refresh
    * oracle (q138) replays. */
  def ivfCentroids(n: Int = 16, dim: Int = 64,
                   salt: String = ""): Array[Array[Double]] = {
    checkSalt(salt)
    Array.tabulate(n, dim)((c, d) => value(s"$salt$c:$d"))
  }

  /** Pinned PQ codebooks: subspace s, centroid c, dim j ->
    * value("<salt>s:c:j") (64-d corpus => 8 subspaces x 8 dims at the
    * defaults). A non-empty `salt` yields a second independent pinned
    * book set — the before/after pair the PQ-refresh oracle (q144)
    * replays. */
  def pqBooks(m: Int = 8, ksub: Int = 16, subDim: Int = 8,
              salt: String = ""): Pq.Codebooks = {
    checkSalt(salt)
    Array.tabulate(m, ksub, subDim)((s, c, j) => value(s"$salt$s:$c:$j"))
  }
}
