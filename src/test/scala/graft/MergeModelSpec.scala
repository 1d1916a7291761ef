package graft

import org.scalatest.funsuite.AnyFunSuite

/** MODEL-BASED check of the per-column SQL MERGE engine: 25 deterministic
  * pseudo-random scenarios (tables + clause lists drawn from a fixed-seed
  * generator) each execute twice — once through the real statement path
  * (GraftMergeColsCommand via spark.sql) and once through a 40-line
  * in-memory reference evaluator of standard MERGE semantics (per-family
  * first-match-wins, NULL-key rows match nothing, unmatched source rows
  * insert only when an INSERT clause exists) — and the committed table
  * must equal the model EXACTLY. This is the strongest guard on the
  * trickiest DML code: three clause families folding into one projection.
  */
class MergeModelSpec extends AnyFunSuite {
  import TestSpark._

  private case class TRow(k: Option[Long], v: Double, tag: String)

  // clause menu: (render(name) => SQL, reference semantics)
  private sealed trait Cl
  private case class MatchDel(cond: Int) extends Cl
  private case class MatchUpd(cond: Int, assign: Int) extends Cl
  private case class BySrcDel(cond: Int) extends Cl
  private case class BySrcUpd(cond: Int, assign: Int) extends Cl
  private case object Ins extends Cl

  // conds: 0 = none, 1 = source price > 50, 2 = target tag = 'a',
  // 3 = target v > 50; 4 = UNQUALIFIED v > 50 — in BY SOURCE clauses the
  // bare name must mean the TARGET (the source side is all NULL there)
  private def condSql(name: String, c: Int): String = c match {
    case 0 => ""
    case 1 => " AND s.v > 50"
    case 2 => s" AND $name.tag = 'a'"
    case 3 => s" AND $name.v > 50"
    case 4 => " AND v > 50"
  }
  private def condHolds(c: Int, t: TRow, s: Option[TRow]): Boolean = c match {
    case 0 => true
    case 1 => s.exists(_.v > 50)
    case 2 => t.tag == "a"
    case 3 | 4 => t.v > 50
  }
  // assigns: 0 = v from source + 1; 1 = tag 'u' and doubled target v;
  // 2 = tag 'x'; 3 = doubled target v; 4 = UNQUALIFIED target v + 1
  private def assignSql(name: String, a: Int): String = a match {
    case 0 => "v = s.v + 1"
    case 1 => s"tag = 'u', v = $name.v * 2"
    case 2 => "tag = 'x'"
    case 3 => s"v = $name.v * 2"
    case 4 => "v = v + 1"
  }
  private def applyAssign(a: Int, t: TRow, s: Option[TRow]): TRow = a match {
    case 0 => t.copy(v = s.get.v + 1)
    case 1 => t.copy(tag = "u", v = t.v * 2)
    case 2 => t.copy(tag = "x")
    case 3 => t.copy(v = t.v * 2)
    case 4 => t.copy(v = t.v + 1)
  }

  private def renderClause(name: String, c: Cl): String = c match {
    case MatchDel(cd) => s"WHEN MATCHED${condSql(name, cd)} THEN DELETE"
    case MatchUpd(cd, a) =>
      s"WHEN MATCHED${condSql(name, cd)} THEN UPDATE SET ${assignSql(name, a)}"
    case BySrcDel(cd) =>
      s"WHEN NOT MATCHED BY SOURCE${condSql(name, cd)} THEN DELETE"
    case BySrcUpd(cd, a) =>
      s"WHEN NOT MATCHED BY SOURCE${condSql(name, cd)} THEN UPDATE SET ${assignSql(name, a)}"
    case Ins => "WHEN NOT MATCHED THEN INSERT (k, v, tag) VALUES (s.k, s.v, 'n')"
  }

  /** The reference: standard MERGE over the model rows. */
  private def model(target: Seq[TRow], source: Seq[TRow],
      clauses: Seq[Cl]): Seq[TRow] = {
    val srcByKey = source.flatMap(r => r.k.map(_ -> r)).toMap
    val matchedCls = clauses.collect { case c: MatchDel => c; case c: MatchUpd => c }
    val bySrcCls = clauses.collect { case c: BySrcDel => c; case c: BySrcUpd => c }
    val hasInsert = clauses.contains(Ins)
    val kept = target.flatMap { t =>
      val s = t.k.flatMap(srcByKey.get)
      val fam = if (s.isDefined) matchedCls else bySrcCls
      // first-match-wins within the row's family
      fam.foldLeft[Either[Option[TRow], TRow]](Left(Some(t))) {
        case (done @ (Right(_) | Left(None)), _) => done
        case (Left(Some(row)), cl) => cl match {
          case MatchDel(cd) =>
            if (condHolds(cd, row, s)) Left(None) else Left(Some(row))
          case BySrcDel(cd) =>
            if (condHolds(cd, row, s)) Left(None) else Left(Some(row))
          case MatchUpd(cd, a) =>
            if (condHolds(cd, row, s)) Right(applyAssign(a, row, s))
            else Left(Some(row))
          case BySrcUpd(cd, a) =>
            if (condHolds(cd, row, s)) Right(applyAssign(a, row, s))
            else Left(Some(row))
          case Ins => Left(Some(row))
        }
      } match {
        case Right(r) => Some(r)
        case Left(o) => o
      }
    }
    val matchedKeys = target.flatMap(_.k).toSet
    val inserts =
      if (hasInsert)
        source.filter(r => r.k.exists(!matchedKeys.contains(_)))
          .map(r => TRow(r.k, r.v, "n"))
      else Nil
    kept ++ inserts
  }

  test("25 random scenarios: the statement path equals the reference model") {
    import spark.implicits._
    // xorshift with a fixed seed — fully deterministic across runs
    var seed = 0x9E3779B97F4A7C15L
    def next(): Long = {
      seed ^= seed << 13; seed ^= seed >>> 7; seed ^= seed << 17
      seed & Long.MaxValue
    }
    def pick(n: Int): Int = (next() % n).toInt
    val tags = Seq("a", "b", "c")

    (1 to 25).foreach { i =>
      val name = s"mm_t$i"
      val root = java.nio.file.Files.createTempDirectory(s"graft_mm$i").toString + "/t"
      graft.plans.GraftDmlRegistry.unregister(name)
      // target: 4-10 distinct keys (some NULL-key rows), source: distinct keys
      val tKeys = (0 until 4 + pick(7)).map(_ => pick(15).toLong).distinct
      val target = tKeys.map(k => TRow(Some(k), pick(100).toDouble, tags(pick(3)))) ++
        (if (pick(2) == 0) Seq(TRow(None, pick(100).toDouble, tags(pick(3)))) else Nil)
      val source = (0 until 3 + pick(8)).map(_ => pick(20).toLong).distinct
        .map(k => TRow(Some(k), pick(100).toDouble, tags(pick(3))))
      // clause list: 1-2 matched, 0-2 by-source, 0-1 insert (order kept
      // within each family, which is all the engine promises)
      val matched: Seq[Cl] = (0 until 1 + pick(2)).map { _ =>
        // marker-shaped conditional deletes (cond 2) are legitimate
        // per-column MERGE — the classifier keys on UPDATE SET *, so
        // delete-only statements stay on the path this spec models
        if (pick(3) == 0) MatchDel(pick(3)) else MatchUpd(pick(3), pick(2))
      }
      val bySrc: Seq[Cl] = (0 until pick(3)).map { _ =>
        if (pick(2) == 0) BySrcDel(Seq(0, 2, 3, 4)(pick(4)))
        else BySrcUpd(Seq(0, 2, 3, 4)(pick(4)), Seq(2, 3, 4)(pick(3)))
      }
      val clauses = matched ++ bySrc ++ (if (pick(4) > 0) Seq(Ins) else Nil)

      graft.sources.SnapshotTable.commit(
        target.map(r => (r.k, r.v, r.tag)).toDF("k", "v", "tag"), root)
      graft.plans.GraftDmlRegistry.registerSnapshot(name, root)
      try {
        source.map(r => (r.k.get, r.v, r.tag)).toDF("k", "v", "tag")
          .createOrReplaceTempView(s"mm_src$i")
        val stmt = s"MERGE INTO $name USING mm_src$i AS s ON $name.k = s.k " +
          clauses.map(renderClause(name, _)).mkString(" ")
        spark.sql(stmt).collect()
        val got = spark.sql(s"SELECT k, v, tag FROM $name").collect()
          .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
            r.getDouble(1), r.getString(2))).toSeq.sorted
        val want = model(target, source, clauses)
          .map(r => (r.k.getOrElse(-1L), r.v, r.tag)).sorted
        assert(got == want,
          s"scenario $i\nstmt: $stmt\ntarget: $target\nsource: $source\n" +
            s"got:  $got\nwant: $want")
      } finally graft.plans.GraftDmlRegistry.unregister(name)
    }
  }

  test("12 random COMPOSITE-KEY scenarios (ON k1 AND k2, conditional INSERT) equal the model") {
    import spark.implicits._
    var seed = 0x243F6A8885A308D3L
    def next(): Long = {
      seed ^= seed << 13; seed ^= seed >>> 7; seed ^= seed << 17
      seed & Long.MaxValue
    }
    def pick(n: Int): Int = (next() % n).toInt
    val tags = Seq("a", "b", "c")
    // rows are (k1, k2, v, tag); the ON conjunction is k1 AND k2, so two
    // rows sharing k1 but not k2 must NOT match — the single-key model
    // would conflate them, which is exactly what this block guards
    case class CRow(k1: Option[Long], k2: Long, v: Double, tag: String)

    (1 to 12).foreach { i =>
      val name = s"mmc_t$i"
      val root = java.nio.file.Files.createTempDirectory(s"graft_mmc$i").toString + "/t"
      graft.plans.GraftDmlRegistry.unregister(name)
      val tkeys = (0 until 5 + pick(6))
        .map(_ => (pick(5).toLong, pick(3).toLong)).distinct
      val target = tkeys.map { case (a, b) =>
        CRow(Some(a), b, pick(100).toDouble, tags(pick(3))) } ++
        (if (pick(2) == 0) Seq(CRow(None, 0L, pick(100).toDouble, "a")) else Nil)
      val source = (0 until 4 + pick(7))
        .map(_ => (pick(7).toLong, pick(3).toLong)).distinct
        .map { case (a, b) => CRow(Some(a), b, pick(100).toDouble, tags(pick(3))) }
      // clause list: one conditional update family draw + a conditional /
      // unconditional INSERT pair (first-match-wins across the family)
      val updCond = pick(3) // reuses condSql/condHolds codes 0-2
      val insCond = pick(2) == 0 // whether the FIRST insert is conditional

      graft.sources.SnapshotTable.commit(
        target.map(r => (r.k1, r.k2, r.v, r.tag)).toDF("k1", "k2", "v", "tag"),
        root)
      graft.plans.GraftDmlRegistry.registerSnapshot(name, root)
      try {
        source.map(r => (r.k1.get, r.k2, r.v, r.tag))
          .toDF("k1", "k2", "v", "tag").createOrReplaceTempView(s"mmc_src$i")
        val insClauses =
          if (insCond)
            "WHEN NOT MATCHED AND s.v > 50 THEN INSERT (k1, k2, v, tag) " +
              "VALUES (s.k1, s.k2, s.v, 'hi') " +
              "WHEN NOT MATCHED THEN INSERT (k1, k2, tag) VALUES (s.k1, s.k2, 'lo')"
          else "WHEN NOT MATCHED THEN INSERT (k1, k2, v, tag) " +
            "VALUES (s.k1, s.k2, s.v, 'n')"
        val stmt = s"MERGE INTO $name USING mmc_src$i AS s " +
          s"ON $name.k1 = s.k1 AND $name.k2 = s.k2 " +
          s"WHEN MATCHED${condSql(name, updCond)} THEN UPDATE SET v = s.v + 1 " +
          insClauses
        spark.sql(stmt).collect()
        val got = spark.sql(s"SELECT k1, k2, v, tag FROM $name").collect()
          .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1),
            if (r.isNullAt(2)) -999.5 else r.getDouble(2),
            r.getString(3))).toSeq
          .sortBy(t => (t._1, t._2, t._4))
        // reference model over composite keys
        val srcByKey = source.map(r => (r.k1.get, r.k2) -> r).toMap
        val kept = target.map { t =>
          val s = t.k1.flatMap(a => srcByKey.get((a, t.k2)))
          if (s.isDefined && condHolds(updCond, TRow(t.k1, t.v, t.tag),
              s.map(x => TRow(x.k1, x.v, x.tag))))
            t.copy(v = s.get.v + 1)
          else t
        }
        val matchedKeys = target.flatMap(t => t.k1.map(a => (a, t.k2))).toSet
        val ins = source.filter(r => !matchedKeys((r.k1.get, r.k2))).map { r =>
          if (!insCond) CRow(r.k1, r.k2, r.v, "n")
          else if (r.v > 50) CRow(r.k1, r.k2, r.v, "hi")
          else CRow(r.k1, r.k2, -999.5, "lo") // v unlisted -> NULL (sentinel)
        }
        val want = (kept ++ ins)
          .map(r => (r.k1.getOrElse(-1L), r.k2, r.v, r.tag))
          .sortBy(t => (t._1, t._2, t._4))
        assert(got == want,
          s"scenario $i\nstmt: $stmt\ntarget: $target\nsource: $source\n" +
            s"got:  $got\nwant: $want")
      } finally graft.plans.GraftDmlRegistry.unregister(name)
    }
  }

  test("cardinality: unmatched duplicate source rows insert; matched duplicates raise") {
    import spark.implicits._
    // the SQL-standard/Delta contract (r19, closing the r18 ADVICE item):
    // the multiple-rows error exists to keep one TARGET row from being
    // updated twice, so duplicate source keys that match no target row are
    // legal — each flows to the INSERT family — while a duplicate that
    // matches raises before anything commits.
    val name = "mm_dup"
    val root = java.nio.file.Files.createTempDirectory("graft_mmdup").toString + "/t"
    graft.plans.GraftDmlRegistry.unregister(name)
    graft.sources.SnapshotTable.commit(
      Seq((1L, 10.0, "a"), (2L, 20.0, "b")).toDF("k", "v", "tag"), root)
    graft.plans.GraftDmlRegistry.registerSnapshot(name, root)
    try {
      // k=7 twice (matches nothing), k=2 once (matches): must succeed,
      // updating k=2 and inserting BOTH k=7 rows
      Seq((7L, 1.0, "x"), (7L, 2.0, "y"), (2L, 99.0, "z"))
        .toDF("k", "v", "tag").createOrReplaceTempView("mm_dup_src")
      spark.sql(s"MERGE INTO $name USING mm_dup_src AS s ON $name.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET v = s.v " +
        "WHEN NOT MATCHED THEN INSERT (k, v, tag) VALUES (s.k, s.v, 'n')").collect()
      val got = spark.sql(s"SELECT k, v, tag FROM $name").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq.sorted
      assert(got == Seq((1L, 10.0, "a"), (2L, 99.0, "b"),
        (7L, 1.0, "n"), (7L, 2.0, "n")), got.toString)
      // now a duplicate that MATCHES k=1: must raise, and the table must
      // be unchanged afterwards (nothing committed)
      Seq((1L, 5.0, "p"), (1L, 6.0, "q")).toDF("k", "v", "tag")
        .createOrReplaceTempView("mm_dup_src2")
      val e = intercept[Exception](
        spark.sql(s"MERGE INTO $name USING mm_dup_src2 AS s ON $name.k = s.k " +
          "WHEN MATCHED THEN UPDATE SET v = s.v " +
          "WHEN NOT MATCHED THEN INSERT (k, v, tag) VALUES (s.k, s.v, 'n')").collect())
      assert(e.getMessage != null && e.getMessage.contains("multiple rows"),
        s"wrong error: ${e.getMessage}")
      val after = spark.sql(s"SELECT k, v, tag FROM $name").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq.sorted
      assert(after == got, "a failed MERGE must not commit")
      // with a DECLARED KEY equal to the ON keys, even UNMATCHED duplicate
      // source keys must raise — each would insert the same primary key
      // (the r19 review finding: the keyed change feed depends on
      // per-version key uniqueness). First clear the legally-inserted k=7
      // duplicates — SET KEY itself (correctly) refuses a duplicated table
      val eDup = intercept[Exception](
        spark.sql(s"ALTER TABLE $name SET KEY (k)").collect())
      assert(eDup.getMessage.contains("unique"), eDup.getMessage)
      spark.sql(s"DELETE FROM $name WHERE k = 7")
      val got2 = spark.sql(s"SELECT k, v, tag FROM $name").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq.sorted
      spark.sql(s"ALTER TABLE $name SET KEY (k)")
      Seq((99L, 1.0, "x"), (99L, 2.0, "y")).toDF("k", "v", "tag")
        .createOrReplaceTempView("mm_dup_src3")
      val e2 = intercept[Exception](
        spark.sql(s"MERGE INTO $name USING mm_dup_src3 AS s ON $name.k = s.k " +
          "WHEN MATCHED THEN UPDATE SET v = s.v " +
          "WHEN NOT MATCHED THEN INSERT (k, v, tag) VALUES (s.k, s.v, 'n')").collect())
      assert(e2.getMessage != null && e2.getMessage.contains("declared key"),
        s"wrong error: ${e2.getMessage}")
      val after2 = spark.sql(s"SELECT k, v, tag FROM $name").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq.sorted
      assert(after2 == got2, "a keyed-dup MERGE must not commit")
      // ...but a MATCHED-ONLY merge (no INSERT branch) with the same
      // unmatched duplicates is VALID (r19 ADVICE refinement): those rows
      // can never insert a duplicate primary key, so refusing them would
      // reject a legal statement — the merge runs and changes nothing
      spark.sql(s"MERGE INTO $name USING mm_dup_src3 AS s ON $name.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET v = s.v").collect()
      val after3 = spark.sql(s"SELECT k, v, tag FROM $name").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq.sorted
      assert(after3 == got2,
        "a matched-only MERGE with unmatched dup keys must be a no-op")
    } finally graft.plans.GraftDmlRegistry.unregister(name)
  }

  test("merge shapes and name hygiene: update-only SET *, conditional SET *, keyword/marker-named columns, alias=target refusal") {
    import spark.implicits._
    val name = "mm_shapes"
    val root = java.nio.file.Files.createTempDirectory("graft_mmshape").toString + "/t"
    graft.plans.GraftDmlRegistry.unregister(name)
    graft.sources.SnapshotTable.commit(
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), root)
    graft.plans.GraftDmlRegistry.registerSnapshot(name, root)
    try {
      // UPDATE-only SET * (no INSERT branch): valid Delta shape — apply
      // updates, ignore unknown keys (previously refused as CDC-incomplete)
      Seq((1L, 11.0), (9L, 99.0)).toDF("k", "v")
        .createOrReplaceTempView("mm_shape_src")
      spark.sql(s"MERGE INTO $name USING mm_shape_src AS s ON $name.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET *").collect()
      val g1 = spark.sql(s"SELECT k, v FROM $name").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(g1 == Set((1L, 11.0), (2L, 20.0)), g1.toString)
      // CONDITIONAL SET * with a conditional INSERT: per-column expansion
      // (previously refused as 'cannot mix with per-column clauses')
      Seq((1L, 5.0), (2L, 50.0), (7L, 70.0)).toDF("k", "v")
        .createOrReplaceTempView("mm_shape_src2")
      spark.sql(s"MERGE INTO $name USING mm_shape_src2 AS s ON $name.k = s.k " +
        s"WHEN MATCHED AND s.v > $name.v THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *").collect()
      val g2 = spark.sql(s"SELECT k, v FROM $name").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(g2 == Set((1L, 11.0), (2L, 50.0), (7L, 70.0)), g2.toString)
      // source columns named like the internal markers ('present', 'dup')
      // and like SQL keywords ('end') must survive: the markers live in a
      // __graft_* namespace and keywords are excluded from the bare-name
      // substitution (qualify s.end to reference the column)
      Seq((2L, 1.0, 2.0, 3.0)).toDF("k", "present", "dup", "end")
        .createOrReplaceTempView("mm_shape_src3")
      spark.sql(s"MERGE INTO $name USING mm_shape_src3 AS s ON $name.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET v = " +
        "CASE WHEN s.present > 0 THEN dup + s.end ELSE 0 END").collect()
      val g3 = spark.sql(s"SELECT v FROM $name WHERE k = 2").head().getDouble(0)
      assert(g3 == 5.0, s"marker/keyword-named source columns corrupted: $g3")
      // a source alias equal to the target name silently hijacked
      // target-qualified references — refuse loudly (the Delta rule)
      val e = intercept[Exception](spark.sql(
        s"MERGE INTO $name USING mm_shape_src AS $name ON $name.k = $name.k " +
          "WHEN MATCHED THEN UPDATE SET v = 0").collect())
      assert(e.getMessage.contains("must differ from the target"), e.getMessage)
    } finally graft.plans.GraftDmlRegistry.unregister(name)
  }
}
