package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** The text-level scanners the SQL DML surface is built on — the exact
  * code the r16 ADVICE audit targeted (literal-blind regex splits). Each
  * case is a shape that BROKE the previous implementation or is a boundary
  * the current one must hold. */
class SqlParserSpec extends AnyFunSuite {

  import GraftSqlParser.{clauseWhenPositions, mapCodeSegments, splitTopLevel, splitTopLevelKeyword, substOutsideLiterals}

  test("clauseWhenPositions skips WHENs inside CASE ... END, including nesting") {
    val s = "WHEN MATCHED THEN UPDATE SET c = CASE WHEN x > 0 THEN 1 " +
      "ELSE CASE WHEN y THEN 2 ELSE 3 END END " +
      "WHEN NOT MATCHED THEN INSERT *"
    val idxs = clauseWhenPositions(s)
    assert(idxs.size == 2 && idxs.head == 0, idxs)
    assert(s.substring(idxs(1)).startsWith("WHEN NOT MATCHED"), idxs)
    // a WHEN inside a string literal is not a boundary either
    val lit = "WHEN MATCHED THEN UPDATE SET c = ' WHEN ' WHEN NOT MATCHED THEN INSERT *"
    assert(clauseWhenPositions(lit).size == 2)
    // parenthesized sub-selects hide their WHENs at depth > 0
    val par = "WHEN MATCHED AND k IN (SELECT CASE WHEN a THEN b END FROM t) " +
      "THEN DELETE WHEN NOT MATCHED THEN INSERT *"
    assert(clauseWhenPositions(par).size == 2)
  }

  test("mapCodeSegments with identity is the identity, on every shape") {
    val shapes = Seq(
      "SELECT 1",
      "SELECT 'a -- not a comment' FROM t -- real comment\nWHERE x = 1",
      "SELECT '''quoted''', 'it''s', '' FROM t /* block 'quote' */ WHERE y = 2",
      "/* leading */ SELECT 1 -- trailing",
      "'unterminated literal runs to the end",
      "-- only a comment",
      "")
    shapes.foreach(s => assert(mapCodeSegments(s)(identity) == s, s"shape: $s"))
  }

  test("substitution never rewrites inside string literals or comments") {
    val sql = "SELECT 'orders', o FROM orders -- orders here\n" +
      "JOIN x ON tag = 'orders' /* orders */ WHERE orders.k = 1"
    val out = substOutsideLiterals(sql, "(?i)\\borders\\b", "V")
    assert(out == "SELECT 'orders', o FROM V -- orders here\n" +
      "JOIN x ON tag = 'orders' /* orders */ WHERE V.k = 1", out)
  }

  test("doubled-quote escapes stay inside one literal") {
    // 'it''s orders' is ONE literal: the name inside must survive
    val out = substOutsideLiterals(
      "SELECT 'it''s orders' FROM orders", "(?i)\\borders\\b", "V")
    assert(out == "SELECT 'it''s orders' FROM V", out)
  }

  test("splitTopLevel ignores commas inside parens and literals") {
    assert(splitTopLevel("a = f(x, y), b = 'p,q', c = (1, 2)") ==
      Seq("a = f(x, y)", "b = 'p,q'", "c = (1, 2)"))
    assert(splitTopLevel("a = 'it''s, fine', b = 2") ==
      Seq("a = 'it''s, fine'", "b = 2"))
  }

  test("splitTopLevelKeyword finds the real WHERE, not one inside a literal") {
    // the r16 ADVICE case: UPDATE t SET c = 'a WHERE b'
    val (set1, w1) = splitTopLevelKeyword("c = 'a WHERE b'", "WHERE")
    assert(set1 == "c = 'a WHERE b'" && w1.isEmpty)
    val (set2, w2) = splitTopLevelKeyword("c = 'a WHERE b' WHERE k = 1", "WHERE")
    assert(set2 == "c = 'a WHERE b'" && w2.map(_.trim).contains("k = 1"))
    // parenthesized WHERE (a subquery in the SET expression) is not the split
    val (set3, w3) = splitTopLevelKeyword(
      "c = (SELECT 1 WHERE true) WHERE k = 2", "WHERE")
    assert(set3 == "c = (SELECT 1 WHERE true)" && w3.map(_.trim).contains("k = 2"))
    // keyword match is word-bounded: a column named anywhere must not split
    val (set4, w4) = splitTopLevelKeyword("c = anywhere + 1", "WHERE")
    assert(set4 == "c = anywhere + 1" && w4.isEmpty)
  }

  test("splitWhenClauses splits at top-level WHEN only") {
    val cs = GraftSqlParser.splitWhenClauses(
      "WHEN MATCHED AND op = 'when matched' THEN DELETE " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(cs.size == 3, cs)
    assert(cs(0).startsWith("WHEN MATCHED AND op") && cs(0).endsWith("DELETE"))
    assert(cs(1) == "WHEN MATCHED THEN UPDATE SET *")
    assert(cs(2) == "WHEN NOT MATCHED THEN INSERT *")
  }

  test("splitTopLevelAll: ON-conjunction ANDs, not ANDs inside parens/literals") {
    import GraftSqlParser.splitTopLevelAll
    assert(splitTopLevelAll("t.a = s.a AND t.b = s.b", "AND").map(_.trim) ==
      Seq("t.a = s.a", "t.b = s.b"))
    assert(splitTopLevelAll("t.a = s.a", "AND").map(_.trim) == Seq("t.a = s.a"))
    // an AND inside parens or a literal is not a conjunct boundary
    assert(splitTopLevelAll("f(x AND y) = 1 AND c = 'a AND b'", "AND")
      .map(_.trim) == Seq("f(x AND y) = 1", "c = 'a AND b'"))
    // word-bounded: a column named brand must not split
    assert(splitTopLevelAll("t.brand = s.brand", "AND").map(_.trim) ==
      Seq("t.brand = s.brand"))
  }
}
