package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the oracle catalog against the r07 q108 regression class:
  * a Scala object-val declared AFTER the `oracle` map that interpolates it
  * is `null` during object construction, silently producing an oracle SQL
  * string containing the literal token `null` (e.g. "WITH null\nSELECT…").
  * 291 green tests did not catch that; this spec does.
  *
  * Legit SQL in this repo always spells the keyword uppercase (`NULL`,
  * `IS NOT NULL`, `CAST(NULL AS …)`), so a case-SENSITIVE `\bnull\b`
  * match on the fully-built string flags exactly the interpolation bug
  * without false positives. This runs over the COMPLETE assembled catalog
  * (SparkEntry.oracleSql forces every ops object's initialization), so any
  * future init-order mistake in any ops file fails here, not in the
  * driver's DuckDB gate a round later.
  */
class OracleCatalogSpec extends AnyFunSuite {

  private val lowerNull = """\bnull\b""".r

  test("every query key has a non-null query function") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    for ((name, fn) <- qs)
      assert(fn != null, s"$name: query function is null")
  }

  test("every oracle string is non-null, non-empty, and free of " +
      "interpolated-null tokens") {
    val oracles = SparkEntry.oracleSql
    assert(oracles.nonEmpty)
    for ((name, sql) <- oracles) {
      assert(sql != null, s"$name: oracle SQL is null (object " +
        "val init-order bug — the interpolated val is declared after " +
        "the oracle map)")
      assert(sql.trim.nonEmpty, s"$name: oracle SQL is empty")
      val hit = lowerNull.findFirstMatchIn(sql)
      assert(hit.isEmpty,
        s"$name: oracle SQL contains lowercase 'null' at char " +
          s"${hit.map(_.start).getOrElse(-1)} — almost certainly an " +
          "uninitialized Scala val interpolated during object " +
          "construction (declare it ABOVE the oracle map or make it a " +
          s"def). Context: …${contextOf(sql, hit.map(_.start).getOrElse(0))}…")
    }
  }

  test("no oracle string carries an unrendered interpolation") {
    // a string literal missing its `s` prefix ships `$ident` / `${...}`
    // verbatim into DuckDB — the sibling failure class of the
    // interpolated-null bug. A bare `$` before a non-identifier char is
    // legit SQL (q18 formats currency with '$' || …); only
    // `$letter`/`$_`/`${` marks a lost interpolation.
    val unrendered = """\$[A-Za-z_{]""".r
    for ((name, sql) <- SparkEntry.oracleSql; if sql != null) {
      val hit = unrendered.findFirstMatchIn(sql)
      assert(hit.isEmpty,
        s"$name: oracle SQL contains '${hit.map(_.matched).getOrElse("")}'" +
          " — missing s-prefix on an interpolated literal? Context: " +
          s"…${contextOf(sql, hit.map(_.start).getOrElse(0))}…")
    }
  }

  test("every oracle key has a matching query (no orphan oracles)") {
    val qKeys = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qKeys
    assert(orphans.isEmpty, s"oracle entries with no query: $orphans")
  }

  test("oracle coverage: every query has an oracle (full-strength gate)") {
    // The driver downgrades oracle-less queries to a rows-only check;
    // the repo's standing bar is 100% oracle coverage. If a genuinely
    // non-SQL-expressible op ever lands, add it to `allowedRowsOnly`.
    val allowedRowsOnly = Set.empty[String]
    val missing =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- allowedRowsOnly
    assert(missing.isEmpty, s"queries with no oracle: $missing")
  }

  private def contextOf(sql: String, at: Int): String = {
    val lo = math.max(0, at - 30)
    val hi = math.min(sql.length, at + 30)
    sql.substring(lo, hi).replace("\n", "\\n")
  }
}
