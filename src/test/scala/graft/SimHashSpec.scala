package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFunctions => TF}

/** G2c: SimHash fingerprint behavior. */
class SimHashSpec extends AnyFunSuite {
  import TestSpark._

  test("simhash is deterministic and separates distinct token bags") {
    val a = TF.simhash64("spark window join filter")
    assert(a == TF.simhash64("spark window join filter"))
    assert(a != TF.simhash64("completely different words here entirely"))
  }

  test("near-identical documents land within a small hamming distance") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 10
    val tweaked = base.trim.split(" ").updated(3, "changed").mkString(" ")
    val h = java.lang.Long.bitCount(TF.simhash64(base.trim) ^ TF.simhash64(tweaked))
    assert(h <= 8, s"hamming $h for a one-token change")
  }

  test("g2c pairs are ordered, distinct, and within the hamming threshold") {
    val rows = SparkEntry.queries("g2c_dedup_simhash")(spark, sfDir).collect()
    val keys = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length == keys.length)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getInt(2) >= 0 && r.getInt(2) <= 6)
    }
  }

  test("strong jaccard pairs are closer in simhash space than random pairs") {
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), lower(col("text")).as("t")).collect()
      .map(r => r.getLong(0) -> TF.simhash64(r.getString(1))).toMap
    val strong = SparkEntry.queries("g2_dedup_near_jaccard")(spark, sfDir).collect()
      .filter(_.getDouble(2) >= 0.6)
      .map(r => (r.getLong(0), r.getLong(1)))
    if (strong.nonEmpty) {
      val strongAvg = strong.map { case (a, b) =>
        java.lang.Long.bitCount(docs(a) ^ docs(b)).toDouble
      }.sum / strong.length
      val ids = docs.keys.toArray.sorted
      val randomAvg = ids.take(40).flatMap(a => ids.takeRight(40).map(b =>
        java.lang.Long.bitCount(docs(a) ^ docs(b)).toDouble)).sum / (40 * 40)
      assert(strongAvg < randomAvg, s"strong $strongAvg !< random $randomAvg")
    }
  }
}
