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

  /** numHashes minhash values per shingle set, via seeded xxhash64 — a plain
    * codegen'd expression, no UDF. */
  def signature(sh: Column, numHashes: Int): Column =
    array((0 until numHashes).map(i =>
      array_min(transform(sh, x => xxhash64(lit(i), x)))): _*)

  /** Near-dup pairs (a_id < b_id) with exact Jaccard >= threshold.
    * `docs` must have columns (id, sh) where sh is a distinct shingle array.
    * Rows with empty shingle sets never match (array_min of empty is null →
    * banding buckets on null hash are dropped).
    */
  def nearDupPairs(docs: DataFrame, threshold: Double,
                   numHashes: Int = 32, numBands: Int = 8): DataFrame = {
    require(numHashes % numBands == 0, "bands must divide hashes")
    val rowsPerBand = numHashes / numBands
    val sig = docs.filter(size(col("sh")) > 0)
      .withColumn("sig", signature(col("sh"), numHashes))
    // one row per (doc, band): the band's slice of the signature, hashed
    val banded = sig.select(col("id"), col("sh"),
        posexplode(array((0 until numBands).map(b =>
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand).cast("string"))): _*))
          .as(Seq("band", "bhash")))
    val a = banded.select(col("id").as("a_id"), col("sh").as("sha"), col("band"), col("bhash"))
    val b = banded.select(col("id").as("b_id"), col("sh").as("shb"), col("band").as("band_b"), col("bhash").as("bhash_b"))
    a.join(b, col("band") === col("band_b") && col("bhash") === col("bhash_b") &&
        col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("sha"), col("shb"))
      .dropDuplicates("a_id", "b_id") // same pair can collide in several bands
      .select(col("a_id"), col("b_id"),
        TextFunctions.jaccard(col("sha"), col("shb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
