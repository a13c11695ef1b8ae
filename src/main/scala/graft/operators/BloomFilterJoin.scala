package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join prefilter — the runtime-filter pattern that makes
  * big-probe/small-build joins affordable at 100 TB: before shuffling the
  * probe side on the join key, drop every probe row whose key cannot be in
  * the build side, using a bits-only summary cheap enough to broadcast.
  * The filter is applied BELOW the shuffle (a narrow `filter` over the
  * scan), so the rows it kills never pay serialization, network, or
  * sort-merge cost; the exact join above it removes the false positives.
  *
  * The filter itself is built with plain DataFrame aggregation — k
  * xxhash64 bit positions per build key, OR-folded into 64-bit words with
  * `bit_or` (map-side partials) — and ships to the driver as
  * numBits/64 longs (sketch METADATA, like range-partition boundaries:
  * 128 KiB for 2^20 bits — the one justified driver-side materialization).
  * The probe test is pure codegen'd column arithmetic on a broadcast
  * array literal; no UDF anywhere.
  */
object BloomFilterJoin {

  /** Build the bit array over `keys.col(keyCol)` (long-hashable values).
    * numBits must be a power of two. fp rate ≈ (1 − e^(−k·n/m))^k.
    */
  def buildBits(keys: DataFrame, keyCol: String, numBits: Int,
      numHashes: Int): Array[Long] = {
    require(Integer.bitCount(numBits) == 1, s"numBits=$numBits not a power of 2")
    // < 64 bits allocates a zero-length word array and crashes on the
    // driver far from the bad argument; 0 hashes crashes mightContain's
    // empty reduce
    require(numBits >= 64, s"numBits=$numBits must be >= 64 (one word)")
    require(numHashes >= 1, s"numHashes=$numHashes must be >= 1")
    val pos = explode(array((0 until numHashes).map(i =>
      pmod(xxhash64(lit(i), col(keyCol)), lit(numBits.toLong))): _*))
    val words = keys.select(pos.as("__pos"))
      .select((col("__pos") / 64).cast("int").as("__w"),
        call_function("shiftleft", lit(1L),
          pmod(col("__pos"), lit(64L)).cast("int")).as("__mask"))
      .groupBy(col("__w"))
      .agg(bit_or(col("__mask")).as("__word"))
      .collect()
    val bits = new Array[Long](numBits / 64)
    words.foreach(r => bits(r.getInt(0)) = r.getLong(1))
    bits
  }

  /** True iff every one of the key's k bloom bits is set — may be a false
    * positive, never a false negative.
    */
  def mightContain(key: Column, bits: Array[Long], numHashes: Int): Column = {
    val numBits = bits.length * 64L
    val arr = typedLit(bits.toSeq)
    (0 until numHashes).map { i =>
      val p = pmod(xxhash64(lit(i), key), lit(numBits))
      call_function("shiftright",
        element_at(arr, (p / 64).cast("int") + 1),
        pmod(p, lit(64L)).cast("int")).bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Exact left-semi join with the bloom prefilter below the shuffle:
    * `probe ⋉ build` on probe(probeKey) = build(buildKey). Result is
    * identical to a plain semi join; the prefilter only changes WHERE
    * rows die.
    */
  def semiJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, numBits: Int = 1 << 20,
      numHashes: Int = 5): DataFrame = {
    // xxhash64 is TYPE-sensitive (int 5 and bigint 5 hash differently)
    // while the exact semi join below coerces and matches them — mismatched
    // key types would drop matching probe rows at the prefilter as SILENT
    // false negatives, violating the never-a-false-negative contract.
    // Fail at construction; the caller casts one side explicitly.
    require(probe.schema(probeKey).dataType == build.schema(buildKey).dataType,
      s"bloom prefilter key types must match exactly: " +
        s"$probeKey is ${probe.schema(probeKey).dataType}, " +
        s"$buildKey is ${build.schema(buildKey).dataType}")
    // no distinct() before the build: bit_or dedups positions inherently,
    // and a pre-shuffle distinct would shuffle |build| keys where the
    // bit_or agg's map-side partials shuffle at most numBits/64 words
    // per mapper
    val bits = buildBits(build.select(col(buildKey)),
      buildKey, numBits, numHashes)
    // bind the probe key to the filtered frame: a bare col(probeKey) is
    // ambiguous when both sides share the key name (the common case for
    // semi joins) and would fail analysis
    val filtered = probe.filter(mightContain(col(probeKey), bits, numHashes))
    filtered.join(build, filtered(probeKey) === build(buildKey), "left_semi")
  }
}
