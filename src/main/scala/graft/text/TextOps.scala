package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable text primitives for the training-data pipeline operators
  * (dedup / language-ID / quality / fingerprinting). All are native Catalyst
  * expressions — no UDFs — so they stay inside whole-stage codegen and
  * distribute as narrow per-row transforms at any scale.
  *
  * Cross-engine determinism: every hash is derived from md5 (identical in
  * every engine) rather than Spark's murmur `hash()` (engine-specific), so
  * DuckDB oracles can recompute results bit-exactly.
  */
object TextOps {

  /** Mersenne prime 2^31-1: modulus for all rolling/minhash arithmetic.
    * Operands stay < 2^62, so ANSI-mode int64 arithmetic never overflows.
    */
  val P: Long = 2147483647L

  /** Whitespace tokenization (the corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Lowercased, whitespace-collapsed normal form for exact dedup. */
  def normText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** 56-bit engine-agnostic string hash: first 14 hex digits of md5.
    * DuckDB twin: `CAST('0x'||substr(md5(x),1,14) AS BIGINT)`.
    */
  def hash56(s: Column): Column =
    conv(substring(md5(s), 1, 14), 16, 10).cast("long")

  /** [[hash56]] reduced mod P — the input domain for minhash permutations. */
  def hashP(s: Column): Column = pmod(hash56(s), lit(P))

  /** Exact integer floor-division, mirroring DuckDB `//` for NON-NEGATIVE
    * operands: floor(a/b) on doubles is exact while the dividend < 2^52
    * (double division is correctly rounded, and a non-integer quotient
    * with denominator b sits ≥ 1/b away from the next integer). Every
    * scaled-integer dividend in this engine is bounded ≤ ~1e15 by
    * construction (scale-free ratios are formed BEFORE multiplying).
    * For possibly-NEGATIVE dividends DuckDB `//` TRUNCATES toward zero
    * instead — mirror those with `(a/b).cast("long")`, not this.
    */
  def idiv(a: Column, b: Column): Column = floor(a / b).cast("long")

  /** Word k-shingles as strings ("w1 w2 w3"), distinct, from a token array.
    * Docs shorter than k shingle to the empty array — guarded explicitly:
    * `sequence(1, 0)` is a DESCENDING [1,0] in Spark, not empty, which
    * would index out of bounds under ANSI mode.
    */
  def shingles(toks: Column, k: Int = 3): Column =
    when(size(toks) >= k,
      array_distinct(
        transform(
          sequence(lit(1), size(toks) - (k - 1)),
          i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j)): _*))))
      .otherwise(typedLit(Seq.empty[String]))

  /** Minhash permutation parameters (a, b): fixed small primes, identical in
    * the DuckDB oracle. 12 hashes = 4 LSH bands × 3 rows.
    */
  val MinhashParams: Seq[(Long, Long)] = Seq(
    (1610612741L, 805306457L), (402653189L, 201326611L),
    (100663319L, 50331653L), (25165843L, 12582917L),
    (6291469L, 3145739L), (1572869L, 786433L),
    (393241L, 196613L), (98317L, 49157L),
    (24593L, 12289L), (6151L, 3079L),
    (1543L, 769L), (389L, 193L))

  val LshBands = 4
  val LshRows = 3 // MinhashParams.size / LshBands

  /** Minhash signature: array of min over shingle-hashes of (a*h+b) mod P.
    * Empty shingle set → signature of P (sentinel max) per slot.
    */
  def minhashSignature(shingleHashes: Column): Column =
    array(MinhashParams.map { case (a, b) =>
      coalesce(
        array_min(transform(shingleHashes,
          h => pmod(h * lit(a) + lit(b), lit(P)))),
        lit(P))
    }: _*)

  /** LSH band-key array ("j:s0:s1:s2") for a minhash signature column —
    * SHARED by the batch near-dup join ([[graft.queries.Dedup]]) and the
    * streaming increment ([[graft.streaming.StreamingDedup]]) so the two
    * paths bucket identically by construction.
    */
  def lshBandKeys(sig: Column): Column =
    array((0 until LshBands).map { j =>
      concat_ws(":", lit(j) +:
        (0 until LshRows).map(r =>
          element_at(sig, j * LshRows + r + 1)): _*)
    }: _*)

  /** Matching-slot count between two minhash signature columns. */
  def minhashMatchedSlots(a: Column, b: Column): Column =
    (1 to MinhashParams.size)
      .map(i => when(element_at(a, i) === element_at(b, i), 1L).otherwise(0L))
      .reduce(_ + _)

  /** 64-bit simhash over token hashes, assembled from per-bit majority votes.
    * Produced via explode/groupBy in the query (not a higher-order fold) so
    * the shape is a distributed partial aggregation, not a per-row loop.
    * Bit j of [[hash56]] only covers 56 bits — use bits 0..55.
    */
  val SimhashBits = 56

  /** Stopword marker lists for stopword-profile language identification. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "y", "es", "un"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  /** Count of tokens from `toks` that appear in `markers`. */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers)))
}
