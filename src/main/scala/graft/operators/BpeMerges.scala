package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning (declared query g35) — the classic
  * byte-pair-encoding trainer shape over a word column:
  *
  *  1. ONE aggregation builds the word-frequency vocab — after this the
  *     corpus is never touched again; at 100 TB that's the whole game.
  *  2. Each merge round pair-counts the vocab table weighted by word
  *     frequency, takes the global argmax (exactly one row to the driver),
  *     and folds the merge back into the symbol sequences as a literal
  *     string replace.
  *
  * Symbol encoding: every symbol owns BOTH its delimiters — 'low' is
  * '|l||o||w|' — so replace('|a||b|', '|ab|') can never match across symbol
  * boundaries and consecutive occurrences share no characters, making
  * left-to-right non-overlapping replacement exact (and identical between
  * Spark's and DuckDB's `replace`, which the oracle relies on). Argmax ties
  * break lexicographically on (a, b): fully deterministic across
  * partitionings, engines, and reruns.
  */
object BpeMerges {

  /** Learn `rounds` merges from a word column named `w` (one row per word
    * OCCURRENCE). Returns (round, "a b", "ab", weighted pair count). */
  def learn(words: DataFrame, rounds: Int): Seq[(Int, String, String, Long)] = {
    val vocab0 = words
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .withColumn("seq", expr(
        "array_join(transform(regexp_extract_all(w, '.', 0), c -> concat('|', c, '|')), '')"))
      .select("freq", "seq")
      .persist()
    try {
      var vocab = vocab0
      val merges = Seq.newBuilder[(Int, String, String, Long)]
      for (round <- 1 to rounds) {
        val top = vocab
          .withColumn("tk", expr("split(trim(BOTH '|' FROM seq), '\\\\|\\\\|')"))
          .filter(size(col("tk")) >= 2)
          .select(col("freq"), col("tk"),
            explode(expr("sequence(1, size(tk) - 1)")).as("i"))
          .select(expr("element_at(tk, cast(i AS int))").as("a"),
            expr("element_at(tk, cast(i AS int) + 1)").as("b"), col("freq"))
          .groupBy("a", "b").agg(sum("freq").as("cnt"))
          .orderBy(col("cnt").desc, col("a"), col("b")) // total order: deterministic
          .limit(1).collect()
        if (top.isEmpty) return merges.result() // vocab fully merged
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((round, s"$a $b", s"$a$b", cnt))
        vocab = vocab.withColumn("seq",
          expr(s"replace(seq, '|$a||$b|', '|$a$b|')"))
      }
      merges.result()
    } finally { vocab0.unpersist(); () }
  }

  /** The learned-merges ledger as a DataFrame. */
  def learnDF(spark: SparkSession, words: DataFrame, rounds: Int): DataFrame = {
    import spark.implicits._
    learn(words, rounds).toDF("round", "pair", "new_token", "pair_count")
      .orderBy("round")
  }

  /** ENCODE with learned merges: add a `n_tok` column — the number of BPE
    * symbols `w` tokenizes to after applying `merges` in learned order.
    * The application is the same delimiter-encoded literal-replace chain
    * the trainer used, evaluated per row inside codegen (merge list is a
    * handful of driver literals — no join, no shuffle; an encode of a
    * 100 TB corpus is a narrow map over the scan). Counting symbols =
    * counting '||' boundaries + 1, so no array materializes. */
  def encodeTokenCount(words: DataFrame,
      merges: Seq[(Int, String, String, Long)]): DataFrame = {
    val seq0 =
      "array_join(transform(regexp_extract_all(w, '.', 0), c -> concat('|', c, '|')), '')"
    val seqK = merges.foldLeft(seq0) { case (acc, (_, pair, merged, _)) =>
      val Array(a, b) = pair.split(" ", 2)
      s"replace($acc, '|$a||$b|', '|$merged|')"
    }
    words.withColumn("n_tok",
      expr(s"size(split(trim(BOTH '|' FROM $seqK), '\\\\|\\\\|'))"))
  }
}
