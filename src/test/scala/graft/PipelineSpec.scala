package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFunctions => TF}

/** Behavior of the round-3 training-pipeline operators (PipelineQueries +
  * e8/a7/c14) beyond what the DuckDB oracle already proves: structural
  * invariants that must hold at any scale factor.
  */
class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  test("FuzzyBlocking: 30%-shared-prefix corpus — exact pair set, bounded buckets") {
    val s = spark
    import s.implicits._
    import graft.operators.FuzzyBlocking
    // adversarial shape: 30% of docs share the 4-char block prefix "the "
    // (web boilerplate mass); the rest spread over 23 prefixes
    val texts = (0 until 400).map { i =>
      val t =
        if (i % 10 < 3) s"the quick fox ${i % 7}${"x" * (i % 3)}"
        else f"pfx${i % 23}%02d body $i"
      (i.toLong, t.take(20))
    }
    val docs = texts.toDF("doc_id", "p")
    val cap = 30
    val got = FuzzyBlocking.pairs(docs, "doc_id", "p", k = 4,
        dist = (a, b) => levenshtein(a, b), cap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // reference: brute-force all-pairs with plain prefix blocking semantics
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = (for {
      (ia, ta) <- texts
      (ib, tb) <- texts
      if ia < ib && ta.take(4) == tb.take(4)
      d = lev(ta, tb) if d <= 4
    } yield (ia, ib, d)).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    // the corpus really is adversarial: the hot (pfx, band) block exceeds cap...
    val base = docs
      .withColumn("pfx", substring(col("p"), 1, 4))
      .withColumn("band", floor(length(col("p")) / 5))
    val counts = base.groupBy("pfx", "band").agg(count(lit(1)).as("cnt"))
      .withColumn("nsalt", greatest(lit(1L), ceil(col("cnt") / lit(cap))).cast("int"))
    assert(counts.agg(max("cnt")).head().getLong(0) > cap)
    // ...and the 2-D split bounds BOTH sides of every join task to ~cap keys
    // (each task sees one hash slice per side, not the whole hot block)
    val maxSlice = base.join(counts, Seq("pfx", "band"))
      .withColumn("slice", pmod(xxhash64(col("doc_id")), col("nsalt").cast("long")))
      .groupBy("pfx", "band", "slice").count()
      .agg(max("count")).head().getLong(0)
    assert(maxSlice <= 2L * cap, s"slice of $maxSlice rows exceeds 2x cap")
  }

  test("g17: no benchmark doc appears on the training side") {
    // fixed-size benchmark slice: doc_id < 50 at every corpus scale
    val r = SparkEntry.queries("g17_contamination_ngram")(spark, sfDir)
    assert(r.filter(col("doc_id") < 50).count() == 0)
    assert(r.filter(col("n_shared") < 1).count() == 0)
  }

  test("g18: sample takes exactly ceil(20%) of every stratum") {
    val sample = SparkEntry.queries("g18_stratified_sample")(spark, sfDir)
      .groupBy("lang").count()
    val strata = Tables(spark, sfDir).documents.groupBy("lang").count()
      .withColumnRenamed("count", "n")
    val bad = sample.join(strata, "lang")
      .filter(col("count") =!= ceil(col("n") * 0.2))
    assert(bad.count() == 0)
  }

  test("g19: redacted preview contains no digit runs or 12+-letter words") {
    val r = SparkEntry.queries("g19_text_redaction")(spark, sfDir)
    // strip the markers (with a space, so two adjacent sub-threshold runs
    // can't merge into a false 12+-letter positive), then nothing matching
    // the redaction patterns remains
    val leftover = r.withColumn("clean",
        regexp_replace(regexp_replace(col("red80"), "<NUM>", " "), "<LONG>", " "))
      .filter(regexp_count(col("clean"), lit("[0-9]+")) > 0 ||
        regexp_count(col("clean"), lit("[a-zA-Z]{12,}")) > 0)
    assert(leftover.count() == 0)
  }

  test("g20: chunks cover every token and overlap by 4 on interior chunks") {
    val chunks = SparkEntry.queries("g20_doc_chunking")(spark, sfDir)
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), size(TF.tokens(col("text"))).as("n"))
    // token coverage: chunk starts stride 12, size 16 > stride → no gaps;
    // so sum of n_toks == n + 4 * (n_chunks - 1) per doc (each overlap
    // double-counts 4 tokens, except the possibly-short final chunk)
    val agg = chunks.groupBy("doc_id")
      .agg(sum("n_toks").as("tok_sum"), count(lit(1)).as("n_chunks"),
        max(col("chunk_id")).as("max_id"))
    val joined = agg.join(docs, "doc_id")
    // chunk ids are dense 0..n_chunks-1
    assert(joined.filter(col("max_id") =!= col("n_chunks") - 1).count() == 0)
    // every token is covered at least once
    assert(joined.filter(col("tok_sum") < col("n")).count() == 0)
  }

  test("g21: quantization error bounded by scale/2 per component (L2 <= 4*scale)") {
    // per-component |err| <= scale/2, so L2 over 64 dims <= sqrt(64)*scale/2
    val r = SparkEntry.queries("g21_embed_quantize")(spark, sfDir)
    val bad = r.filter(col("qerr") > col("scale_r") * 4.0 + 1e-9)
    assert(bad.count() == 0)
  }

  test("e8: session gaps never exceed 30 minutes inside a session") {
    // consecutive sessions of one user must be separated by > 30 min:
    // next session's start minus this session's end > 1800s
    val s8 = SparkEntry.queries("e8_win_sessionize")(spark, sfDir)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("session_id")
    val gaps = s8.withColumn("next_start", lead(col("s_start"), 1).over(w))
      .filter(col("next_start").isNotNull)
      .filter(unix_timestamp(col("next_start").cast("timestamp")) -
        unix_timestamp(col("s_end").cast("timestamp")) <= 1800)
    assert(gaps.count() == 0)
    // and every event lands in exactly one session
    val nEvents = s8.agg(sum("n_events")).head().getLong(0)
    assert(nEvents == Tables(spark, sfDir).events.count())
  }

  test("c14: salted join equals the plain join exactly") {
    val salted = SparkEntry.queries("c14_join_salted_skew")(spark, sfDir)
    val t = Tables(spark, sfDir)
    val plain = t.events.join(t.customer, col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), Tables.dsum(col("value")).as("val_sum"))
      .orderBy("c_mktsegment")
    assert(salted.collect().toSeq == plain.collect().toSeq)
  }

  test("a7: merged read null-fills the added column for v1 rows only") {
    val r = SparkEntry.queries("a7_schema_evolution")(spark, sfDir)
    assert(r.filter(col("v") === "v1" && col("n_regionkey").isNotNull).count() == 0)
    assert(r.filter(col("v") === "v2" && col("n_regionkey").isNull).count() == 0)
  }

  test("g56: fully-kept docs reconstruct exactly; some doc loses covered tokens") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("g56_substring_dedup")(spark, sfDir).cache()
    try {
      assert(r.filter(col("n_kept") > col("n_toks") || col("n_kept") < 0).count() == 0)
      // the corpus has boilerplate, so substring dedup must remove something
      assert(r.filter(col("n_kept") < col("n_toks")).count() > 0, "nothing deduped")
      // a doc that kept every token reconstructs its (lowercased) text
      // byte-for-byte — join-on-space inverts split-on-space exactly
      val full = r.filter(col("n_kept") === col("n_toks"))
      assert(full.count() > 0, "no doc fully kept")
      val mismatched = full.join(Tables(spark, sfDir).documents, "doc_id")
        .filter(col("clean_text") =!= lower(col("text")))
      assert(mismatched.count() == 0)
    } finally { r.unpersist(); () }
  }

  test("g57: first document is all-novel; novelty is n_novel/n_grams in [0,1]") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("g57_ngram_novelty")(spark, sfDir).cache()
    try {
      val first = r.orderBy("doc_id").limit(1).head()
      assert(first.getLong(1) == first.getLong(2), "corpus-first doc must be 100% novel")
      assert(r.filter(col("novelty") < 0 || col("novelty") > 1).count() == 0)
      assert(r.filter(abs(col("novelty") * col("n_grams") - col("n_novel")) > 1e-9).count() == 0)
    } finally { r.unpersist(); () }
  }

  test("g35: BPE merges match the hand-computed classic corpus") {
    val s = spark
    import s.implicits._
    // Sennrich-style toy corpus: low*5, lower*2, newest*6, widest*3.
    // Hand-computed pair totals: (e,s)=9 ties (s,t)=9 -> (e,s) wins lex;
    // then (es,t)=9; then (l,o)=7 ties (o,w)=7 -> (l,o) wins lex.
    val words = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).toDF("w")
    val merges = graft.operators.BpeMerges.learn(words, rounds = 3)
    assert(merges == Seq(
      (1, "e s", "es", 9L),
      (2, "es t", "est", 9L),
      (3, "l o", "lo", 7L)))
    // multi-char merged symbols keep exact boundaries: learning further
    // rounds on a tiny fully-mergeable vocab terminates early, not wrongly
    val tiny = Seq("ab", "ab").toDF("w")
    val m2 = graft.operators.BpeMerges.learn(tiny, rounds = 5)
    assert(m2 == Seq((1, "a b", "ab", 2L)), m2.toString)
    // encode applies the same merges: after (e,s)(es,t)(l,o):
    // newest -> n,e,w,est = 4; low -> lo,w = 2; lower -> lo,w,e,r = 4;
    // widest -> w,i,d,est = 4
    val enc = graft.operators.BpeMerges
      .encodeTokenCount(Seq("newest", "low", "lower", "widest").toDF("w"), merges)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(enc == Map("newest" -> 4, "low" -> 2, "lower" -> 4, "widest" -> 4), enc.toString)
  }

  test("g66: span corruption is lossless — splicing targets back rebuilds the doc") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("g66_span_corruption")(s, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    val docs = graft.Tables(s, dir).documents
      .select(col("doc_id"), lower(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == docs.keySet)
    val sentinel = "<extra_id_(\\d+)>".r
    var masked = 0L
    out.foreach { case (id, (nSpans, nMasked, corrupted, target)) =>
      // parse target into sentinel-id -> span text
      val hits = sentinel.findAllMatchIn(target).toVector
      val spans = hits.zipWithIndex.map { case (m, i) =>
        val end = if (i + 1 < hits.size) hits(i + 1).start else target.length
        m.group(1).toInt -> target.substring(m.end, end).stripPrefix(" ").stripSuffix(" ")
      }.toMap
      assert(spans.size == nMasked, s"doc $id: ${spans.size} target spans vs $nMasked")
      assert(spans.keySet == (0 until nMasked.toInt).toSet, s"doc $id sentinel ids not dense")
      // splice: every sentinel in the corrupted input is replaced by its span
      val rebuilt = sentinel.replaceAllIn(corrupted,
        m => scala.util.matching.Regex.quoteReplacement(spans(m.group(1).toInt)))
      assert(rebuilt == docs(id), s"doc $id reconstruction mismatch")
      assert(nSpans >= nMasked)
      masked += nMasked
    }
    // the 15%-ish mask rate actually fires somewhere in the corpus
    assert(masked > 0, "no spans were masked anywhere")
  }
}
