package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MinHashLSH, TextFunctions => TF}

/** G2 scale path (SURVEY §7.3): the MinHash-banded candidate generator must
  * agree with unblocked brute force on the pairs that matter. */
class MinHashSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val base = Tables(spark, sfDir).documents
    .withColumn("toks", TF.tokens(lower(col("text"))))
    .select(col("doc_id").as("id"), TF.shingles3("toks").as("sh"))

  private lazy val brute: Map[(Long, Long), Double] = {
    val a = base.select(col("id").as("a_id"), col("sh").as("sha"))
    val b = base.select(col("id").as("b_id"), col("sh").as("shb"))
    a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), TF.jaccard(col("sha"), col("shb")).as("j"))
      .filter(col("j") >= 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
  }

  // the brute side above stays on declarative shingle ARRAYS while the LSH
  // path runs entirely on kernel shingle hashes — agreeing jaccard values
  // cross-check the two independent formulations
  private lazy val lsh: Map[(Long, Long), Double] =
    MinHashLSH.nearDupPairs(
      Tables(spark, sfDir).documents
        .select(col("doc_id").as("id"), lower(col("text")).as("txt")),
      threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("every LSH pair is a true near-duplicate (no false positives)") {
    lsh.keys.foreach(k => assert(brute.contains(k), s"false positive pair $k"))
    lsh.foreach { case (k, j) => assert(math.abs(j - brute(k)) < 1e-12) }
  }

  test("high-similarity pairs (jaccard >= 0.7) are all recalled") {
    val strong = brute.filter(_._2 >= 0.7).keySet
    val missed = strong -- lsh.keySet
    assert(missed.isEmpty, s"LSH missed strong pairs: $missed")
  }

  test("overall recall at threshold 0.4 is reasonable") {
    if (brute.nonEmpty) {
      val recall = lsh.size.toDouble / brute.size
      assert(recall >= 0.5, s"recall $recall over ${brute.size} true pairs")
    }
  }
}
