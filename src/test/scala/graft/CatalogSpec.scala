package graft

import org.scalatest.funsuite.AnyFunSuite

/** CATALOG.md must always reflect the declared query surface: regenerate
  * with `sbt "runMain graft.tools.Catalog"` whenever a query is added,
  * moved, or its header comment changes.
  */
class CatalogSpec extends AnyFunSuite {

  test("CATALOG.md is current (regenerate with runMain graft.tools.Catalog)") {
    val path = java.nio.file.Paths.get("CATALOG.md")
    assert(java.nio.file.Files.exists(path), "CATALOG.md missing")
    val cur = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    assert(cur == graft.tools.Catalog.render("."),
      "CATALOG.md is stale — run `sbt \"runMain graft.tools.Catalog\"`")
  }

  test("every CATALOG row's file:line is the id's real definition site") {
    // the r16 audit found 9 rows pointing at j16's deps map instead of the
    // query lambdas — this pins attribution, not just freshness: the cited
    // line must open the id's own lambda or reference a same-file def
    val rows = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("CATALOG.md")), "UTF-8")
      .linesIterator.filter(_.startsWith("| `")).toSeq
    assert(rows.size == SparkEntry.queries.size, s"row count ${rows.size}")
    val fileCache = scala.collection.mutable.Map.empty[String, Vector[String]]
    rows.foreach { r =>
      val cols = r.split("\\|").map(_.trim)
      val id = cols(1).stripPrefix("`").stripSuffix("`")
      val Array(file, line) = cols(3).split(":")
      val lines = fileCache.getOrElseUpdate(file, {
        val s = scala.io.Source.fromFile(file)(scala.io.Codec.UTF8)
        try s.getLines().toVector finally s.close()
      })
      val l = lines(line.toInt - 1)
      assert(l.trim.startsWith(s""""$id" ->"""),
        s"$id: cited line $file:$line does not define it: $l")
      val isLambda = l.contains("-> ((")
      val identRe = """^\s*"[a-z0-9_]+" -> ([A-Za-z][A-Za-z0-9_]*)\s*,?\s*$""".r
      val isRef = l match {
        case identRe(ident) =>
          lines.exists(_.matches(s"""^\\s*(private\\s+)?(lazy\\s+)?(def|val)\\s+$ident\\b.*"""))
        case _ => false
      }
      assert(isLambda || isRef,
        s"$id: cited line is neither a lambda nor a same-file def reference: $l")
    }
  }

  test("every declared query has an oracle or is a documented rows-only op") {
    // rows-only queries must be the known approximate/streaming set — a new
    // query landing without an oracle by ACCIDENT fails here
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // g39/g40/g42/g61 were converted to full oracles in r14, g55 in r15,
    // i17/i4/i6/i8 in r16 (watermark- or chunk-determined outputs) — the
    // allowed set is kept EXACT so a conversion regression fails too
    val allowed = Set(
      "d11_agg_approx_percentile", "d3_agg_approx_distinct",
      "g15b_dedup_embed_lsh", "g26_vocab_heavyhitters",
      "g2b_dedup_minhash_lsh", "g2c_dedup_simhash",
      "g5b_knn_lsh", "h3_udaf_hll", "h5_sketch_reagg",
      "h6_sketch_intersect", "i11_stream_hll", "i14_stream_neardup_filter")
    val converted = allowed -- rowsOnly
    assert(converted.isEmpty,
      s"oracle-backed queries still on the rows-only allowlist: ${converted.mkString(", ")}")
    val unexpected = rowsOnly -- allowed
    assert(unexpected.isEmpty,
      s"queries without oracles not on the documented rows-only list: ${unexpected.mkString(", ")}")
  }
}
