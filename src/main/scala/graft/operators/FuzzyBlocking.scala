package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** De-skewed blocking for fuzzy (edit-distance ≤ k) self-join pairs — the
  * g30 family's join shape, hardened for web-scale prefix mass.
  *
  * A raw prefix block key skews catastrophically on real text: "the ",
  * "http", boilerplate headers concentrate a constant fraction of the corpus
  * into one block, which then goes quadratic on one reducer. Two fixes
  * compose here, and neither changes the pair set:
  *
  *  1. **Composite block key** (prefix, length band of width k+1). Length is
  *     free selectivity — |len(a) − len(b)| ≤ dist ≤ k — so same-prefix docs
  *     in far-apart bands never needed comparing. Pairs can straddle one
  *     band boundary, so the LEFT side replicates to the ±1 neighbor bands;
  *     band width (k+1) > k guarantees the partner's band is within ±1, and
  *     the RIGHT side sits in exactly one bucket, so every qualifying pair
  *     is generated exactly once — no dedup pass.
  *  2. **Per-block cap + salting.** Block row counts are aggregated first
  *     (metadata-sized: one row per block); any block over `cap` rows gets
  *     ceil(cnt/cap) salts — the right side hashes into a salt, the left
  *     side replicates across them (same idiom as the c14 salted join), so
  *     no reducer ever holds more than ~cap build rows no matter how hot
  *     the prefix.
  *
  * Result: identical to the un-salted, un-banded blocked join (the oracle
  * replays plain prefix blocking), with per-bucket work bounded by
  * cap² instead of (hottest prefix mass)².
  */
object FuzzyBlocking {

  /** Fuzzy pairs (doc_a < doc_b, dist ≤ k) over `docs(idCol, keyCol)`.
    *
    * @param dist edit-distance column builder, e.g.
    *             `(a, b) => levenshtein(a, b)` or the banded `lev_bounded`
    * @param cap  max rows a single (prefix, band, salt) bucket may hold on
    *             the build side before salting splits it further
    */
  def pairs(docs: DataFrame, idCol: String, keyCol: String, k: Int,
      dist: (Column, Column) => Column, cap: Int = 20000): DataFrame = {
    val base = docs.select(col(idCol).as("id"), col(keyCol).as("p"))
      .withColumn("pfx", substring(col("p"), 1, 4))
      .withColumn("band", floor(length(col("p")) / (k + 1)))
    // one row per block — metadata scale; nsalt = ceil(cnt / cap)
    val counts = base.groupBy("pfx", "band")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("nsalt", greatest(lit(1L), ceil(col("cnt") / lit(cap))).cast("int"))
      .select("pfx", "band", "nsalt")
    // right side: its own band, ONE salt by id hash (xxhash64 is total)
    val rhs = base.join(counts, Seq("pfx", "band"))
      .select(col("id").as("doc_b"), col("p").as("pb"), col("pfx"), col("band"),
        pmod(xxhash64(col("id")), col("nsalt").cast("long")).cast("int").as("salt"))
    // left side: replicate to bands ±1 (inner join drops bands with no rows),
    // then across every salt of the target band
    val lhs = base
      .withColumn("band", explode(array(col("band") - 1, col("band"), col("band") + 1)))
      .join(counts, Seq("pfx", "band"))
      .withColumn("salt", explode(expr("sequence(0, nsalt - 1)")))
      .select(col("id").as("doc_a"), col("p").as("pa"), col("pfx"), col("band"), col("salt"))
    lhs.join(rhs, Seq("pfx", "band", "salt"))
      .filter(col("doc_a") < col("doc_b"))
      // cheap length prefilter: skips the DP kernel for sure-misses
      .filter(abs(length(col("pa")) - length(col("pb"))) <= k)
      .withColumn("dist", dist(col("pa"), col("pb")))
      .filter(col("dist") <= k)
      .select(col("doc_a"), col("doc_b"), col("dist"))
  }
}
