package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable deterministic hashing used by the text-pipeline operators
  * (fingerprinting, MinHash, SimHash).
  *
  * Two tiers:
  *   - `xxhash64(...)` (Spark-native, codegen'd) — the production path for
  *     100 TB runs; fastest, but engine-specific.
  *   - polynomial rolling hashes below — bit-for-bit reproducible in any
  *     engine with 64-bit integer arithmetic (the DuckDB correctness oracle
  *     replicates them with list_reduce), used by the oracle-checked
  *     queries and for cross-engine-stable document fingerprints.
  *
  * All arithmetic stays within Long range: acc < P (~1e9+7), acc*31 + 0xFFFF
  * << 2^63.
  */
object Hashing {

  /** Modulus for the polynomial hashes (fits Long arithmetic without
    * overflow at base 31). */
  val P: Long = 1000000007L

  /** Driver-side polynomial rolling hash over UTF-16 code units:
    * H(s) = fold(acc*31 + c) mod P, acc0 = 0.
    */
  def polyHash(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % P)

  /** Column variant — the native codegen'd expression
    * (graft.expressions.PolyHash): identical arithmetic, compiled loop
    * instead of an interpreted higher-order fold. DuckDB replica:
    * list_reduce(list_prepend(0, [ascii(c) for c in string_split(s,'')]),
    *             (a,b) -> (a*31+b) % 1000000007)
    *
    * (UTF-16 code units here vs DuckDB's codepoints — equal for ASCII/BMP
    * inputs, which is what the corpus holds.)
    */
  def polyHashCol(s: Column): Column = graft.expressions.PolyHash.col(s)

  /** Combine a sequence of pre-hashed values (e.g. word hashes into a
    * shingle hash): fold(acc*31 + h) mod P over an array<long> column.
    */
  def polyCombineCol(hashes: Column): Column =
    aggregate(hashes, lit(0L),
      (acc, h) => pmod(acc * lit(31L) + h, lit(P)))

  /** j-th universal-hash reseed of a base hash: (a_j*h + b_j) mod P with
    * fixed odd multipliers — identical formula on the oracle side. */
  def reseedCol(h: Column, j: Int): Column =
    pmod(h * lit(2L * j + 1) + lit(j * 12345L + 678L), lit(P))

  def reseed(h: Long, j: Int): Long =
    Math.floorMod(h * (2L * j + 1) + (j * 12345L + 678L), P)

  /** Nonlinear scatter of a poly hash for SHORT STRUCTURED inputs
    * ("j:d" index pairs and the like). The raw polynomial of a short
    * string never wraps P, so consecutive inputs form arithmetic
    * progressions and any AFFINE post-mix (multiply/add mod P) maps
    * them to rotation sequences whose threshold bits stay heavily
    * correlated across rows (measured: sign-matrix row correlations of
    * 0.9+ — a rank-degenerate SRP). Squaring first makes the
    * progression quadratic, which decorrelates to the random baseline
    * (SrpSpec pins this). All intermediates fit in a Long:
    * h < P ~ 1e9 so h*h < 1e18 and (h*h mod P)*2654435761 < 2.7e18.
    * DuckDB replica: ((h*h) % 1000000007 * 2654435761) % 1000000007. */
  def squareMix(h: Long): Long = ((h * h) % P * 2654435761L) % P

  /** Column variant of [[squareMix]] — identical arithmetic (all
    * intermediates in Long range, see above). ONE owner for the mix
    * constant: engine-side scatter sites must use this (and oracle-side
    * ones TextQueries.Sql.sqmix) so the two forms cannot drift. */
  def squareMixCol(h: Column): Column =
    h * h % lit(P) * lit(2654435761L) % lit(P)
}
