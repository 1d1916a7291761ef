package graft.tools

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** Generates CATALOG.md — the auditable index of every declared query:
  * id, oracle-backed or rows-only, definition site (file:line), and a
  * one-line description distilled from the definition's comment block.
  * 259+ queries outgrew README prose; this keeps the surface enumerable
  * without hand-maintenance.
  *
  * `runMain graft.tools.Catalog` rewrites the file;
  * `runMain graft.tools.Catalog --check` fails if it is stale (CatalogSpec
  * runs the same assertion under `sbt test`, so the gate is automatic).
  */
object Catalog {

  private case class Site(file: String, line: Int, desc: String)

  /** First DEFINITION site of each query under operators/: the match's RHS
    * must open a query lambda (`"name" -> ((s, dir) => ...`) or name a def
    * defined in the same file (`"name" -> knnBlock,`) — a plain `"name" ->`
    * would also hit oracle-SQL entries and incidental maps (j16's deps map
    * shadowed 9 query sites in r16). The queries Seq precedes the oracles
    * Seq in every module, so within a file the first qualifying match is
    * still the implementation when a bare-ident oracle alias reuses it. */
  private def sites(root: String): Map[String, Site] = {
    val dir = new java.io.File(s"$root/src/main/scala/graft/operators")
    val lambdaPat = """^\s*"([a-z0-9_]+)" -> \(\(.*""".r
    val identPat = """^\s*"([a-z0-9_]+)" -> ([A-Za-z][A-Za-z0-9_]*)\s*,?\s*$""".r
    val out = scala.collection.mutable.Map.empty[String, Site]
    dir.listFiles().filter(_.getName.endsWith(".scala")).sortBy(_.getName)
      .foreach { f =>
        val lines = {
          val s = scala.io.Source.fromFile(f)(scala.io.Codec.UTF8)
          try s.getLines().toVector finally s.close()
        }
        def hasDef(ident: String): Boolean =
          lines.exists(_.matches(s"""^\\s*(private\\s+)?(lazy\\s+)?(def|val)\\s+$ident\\b.*"""))
        lines.zipWithIndex.foreach { case (l, i) =>
          l match {
            case lambdaPat(name) if !out.contains(name) =>
              out(name) = Site(s"src/main/scala/graft/operators/${f.getName}",
                i + 1, describe(lines, i))
            case identPat(name, ident) if !out.contains(name) && hasDef(ident) =>
              out(name) = Site(s"src/main/scala/graft/operators/${f.getName}",
                i + 1, describe(lines, i))
            case _ =>
          }
        }
      }
    out.toMap
  }

  /** One-line description from the contiguous `//` block above line `i`:
    * text after the leading "X9: " tag, cut at the first sentence break. */
  private def describe(lines: Vector[String], i: Int): String = {
    var j = i - 1
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (j >= 0 && lines(j).trim.startsWith("//")) {
      buf.prepend(lines(j).trim.stripPrefix("//").trim)
      j -= 1
    }
    if (buf.isEmpty) return ""
    val joined = buf.mkString(" ")
    val tagged = "^[A-Za-z0-9]+[a-z]?: (.*)$".r
    val body = joined match { case tagged(rest) => rest; case _ => joined }
    // cut at the first hard break: " — " (the comment style's summary/detail
    // divider) or sentence end; cap length for the table
    val cutDash = body.indexOf(" — ")
    val cutDot = body.indexOf(". ")
    val cut = Seq(cutDash, cutDot).filter(_ >= 0).sorted.headOption
      .getOrElse(body.length)
    val s = body.substring(0, math.min(cut, body.length)).stripSuffix(".")
    val trimmed = if (s.length > 140) s.take(137) + "..." else s
    trimmed.replace("|", "\\|")
  }

  def render(root: String = "."): String = {
    val qNames = graft.SparkEntry.queries.keys.toSeq
    val oracles = graft.SparkEntry.oracleSql.keySet
    val at = sites(root)
    val missing = qNames.filterNot(at.contains)
    require(missing.isEmpty,
      s"catalog: no definition site found for: ${missing.mkString(", ")}")
    val rows = qNames.map { n =>
      val s = at(n)
      val o = if (oracles(n)) "yes" else "rows-only"
      s"| `$n` | $o | ${s.file}:${s.line} | ${s.desc} |"
    }
    val nOracle = qNames.count(oracles)
    Seq(
      "# Query catalog",
      "",
      "GENERATED — do not edit. Regenerate with",
      "`sbt \"runMain graft.tools.Catalog\"`; `sbt test` (CatalogSpec) fails if",
      "this file is stale.",
      "",
      s"${qNames.size} declared queries: $nOracle oracle-backed (DuckDB",
      s"rows+schema+hash compare), ${qNames.size - nOracle} rows-only by design",
      "(approximate sketches, iterative trainers, micro-batch-dependent",
      "streams — each covered by a named unit suite).",
      "",
      "| id | oracle | where | description |",
      "|---|---|---|---|"
    ).mkString("\n") + "\n" + rows.mkString("\n") + "\n"
  }

  def main(args: Array[String]): Unit = {
    val root = "."
    val out = Paths.get(root, "CATALOG.md")
    val content = render(root)
    if (args.contains("--check")) {
      val cur =
        if (Files.exists(out)) new String(Files.readAllBytes(out), UTF_8) else ""
      require(cur == content,
        "CATALOG.md is stale — run `sbt \"runMain graft.tools.Catalog\"`")
      println("CATALOG.md is current")
    } else {
      Files.write(out, content.getBytes(UTF_8))
      println(s"wrote ${out.toAbsolutePath} (${content.count(_ == '\n')} lines)")
    }
  }
}
