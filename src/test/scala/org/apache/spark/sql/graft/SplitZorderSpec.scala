package org.apache.spark.sql.graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins on [[GraftSqlParser.splitTrailingZorder]] (review r18:
  * the SQL-level CompactWhereSpec cases assert only that the
  * cannot-combine error fires, which the old single-pass split also
  * satisfied — the iterative behavior needs the residual predicate
  * and collected dims pinned directly).
  */
class SplitZorderSpec extends AnyFunSuite {
  private def split(s: String) = GraftSqlParser.splitTrailingZorder(s)

  test("single trailing clause splits off, predicate clean") {
    assert(split("k >= 1001 ZORDER BY (k)") ==
      (("k >= 1001", Some("k"))))
  }

  test("repeated trailing clauses ALL strip (ADVICE r17), dims in " +
      "source order") {
    assert(split("k >= 1001 ZORDER BY (a) ZORDER BY (b)") ==
      (("k >= 1001", Some("a,b"))))
    assert(split("p ZORDER BY (a, b) ZORDER BY (c) ZORDER BY (d)") ==
      (("p", Some("a, b,c,d"))))
  }

  test("no trailing clause: predicate unchanged, no dims") {
    assert(split("k >= 1001") == (("k >= 1001", None)))
  }

  test("zorder text INSIDE a quoted literal stays the predicate " +
      "(ADVICE r16 quote parity, preserved per iteration)") {
    assert(split("note = 'zorder by (x)'") ==
      (("note = 'zorder by (x)'", None)))
    // a real clause AFTER the literal still strips — and only it
    assert(split("note = 'zorder by (x)' ZORDER BY (k)") ==
      (("note = 'zorder by (x)'", Some("k"))))
    // a clause-shaped tail still inside the literal does not strip
    // (anchor + parity guards together)
    assert(split("note = 'a ZORDER BY (k)'") ==
      (("note = 'a ZORDER BY (k)'", None)))
    assert(split("x != 'p ZORDER BY (a)' ZORDER BY (b) ") ==
      (("x != 'p ZORDER BY (a)'", Some("b"))))
  }
}
