package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.XXH64

/** Bloom filter with `numProbes` INDEPENDENTLY SEEDED xxhash64 probes.
  *
  * Why not `org.apache.spark.util.sketch.BloomFilter`: it derives its
  * k probe positions by Kirsch–Mitzenmacher double hashing
  * (`h1 + i·h2 mod m`). When `h2 mod m` lands in a short additive
  * cycle of m, the k probes collapse onto a handful of distinct bits
  * and that item's false-positive probability degrades to roughly the
  * filter's bit load raised to the CYCLE length — a per-item FP floor
  * around 1e-5..1e-6 regardless of the requested fpp. Measured here:
  * a document with ZERO true shingle overlap probed positive at
  * fpp=1e-9 (sf0.001 `documents` fixture, doc_id 423), which breaks
  * any gate premised on "no false positives at tiny fpp". Independent
  * seeds (bit_i = xxhash64(item, seed=i) mod m) restore the textbook
  * (1 − e^(−kn/m))^k bound.
  *
  * The word array is meant to travel as a Broadcast (built once,
  * fetched once per executor); probes are O(numProbes) bit tests.
  */
final case class GraftBloom(numProbes: Int, words: Array[Long])
    extends Serializable {
  private val mBits: Long = words.length.toLong * 64L

  def mightContain(h: Long): Boolean = {
    var i = 0
    while (i < numProbes) {
      val bit = java.lang.Math.floorMod(XXH64.hashLong(h, i.toLong), mBits)
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63L).toInt)) == 0L)
        return false
      i += 1
    }
    true
  }

  def sizeBytes: Long = words.length.toLong * 8L
}

object GraftBloom {

  /** Optimal bit count for (n, fpp), rounded up to whole 64-bit words
    * (≥ 1 word). Fails loudly past Int.MaxValue words (~17 GB): a
    * silent .toInt wrap would build a far-undersized filter that
    * PASSES downstream byte-size guards while inflating the FP rate —
    * over-removing clean documents at exactly the scale the guards
    * exist for. */
  def numWords(expectedItems: Long, fpp: Double): Int = {
    require(expectedItems > 0, s"expectedItems=$expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp=$fpp")
    val m = math.ceil(-expectedItems.toDouble * math.log(fpp) /
      (math.log(2) * math.log(2)))
    val w = math.max(1L, math.ceil(m / 64.0).toLong)
    // GiB = words / 2^27 (8 bytes/word): dividing first cannot
    // overflow, where `w * 8` would wrap negative for w > 2^60 —
    // garbage in exactly the loud-failure diagnostic
    require(w <= Int.MaxValue.toLong,
      s"bloom for expectedItems=$expectedItems fpp=$fpp needs $w words " +
      s"(${w / (1L << 27)} GiB) — past the single-array limit; " +
      "shard the filter or raise fpp")
    w.toInt
  }

  /** Optimal probe count for n items in m bits. */
  def numProbes(expectedItems: Long, mBits: Long): Int =
    math.max(1, math.round(math.log(2) * mBits / expectedItems.toDouble).toInt)

  /** Build distributed: per-partition local bit arrays OR-reduced on a
    * tree — one pass over the hashes, driver memory = one word array.
    * `hashes` is a single LongType column (nulls ignored). */
  def build(hashes: DataFrame, col: String, expectedItems: Long,
      fpp: Double): GraftBloom = {
    val nw = numWords(expectedItems, fpp)
    val k = numProbes(expectedItems, nw.toLong * 64L)
    val rows = hashes.select(col).na.drop()
    val rdd = rows.rdd
    if (rdd.isEmpty()) return GraftBloom(k, new Array[Long](nw))
    val words = rdd.mapPartitions { it =>
      val arr = new Array[Long](nw)
      val m = nw.toLong * 64L
      it.foreach { r =>
        val h = r.getLong(0)
        var i = 0
        while (i < k) {
          val bit = java.lang.Math.floorMod(XXH64.hashLong(h, i.toLong), m)
          arr((bit >>> 6).toInt) |= (1L << (bit & 63L).toInt)
          i += 1
        }
      }
      Iterator.single(arr)
    }.treeReduce { (a, b) =>
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    GraftBloom(k, words)
  }
}
