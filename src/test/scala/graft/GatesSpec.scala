package graft

import org.scalatest.funsuite.AnyFunSuite

/** Keeps the per-query gate-provenance artifact honest (r10 VERDICT item
  * 8): every registered query must carry a machine-checkable gate, the
  * named suites must exist, and the committed gates.json + COVERAGE.md's
  * rows-only list must match what SparkEntry actually registers — so a
  * new rows-only query cannot land without declaring how it is gated.
  */
class GatesSpec extends AnyFunSuite {

  test("every registered query declares at least one gate") {
    val empty = SparkEntry.gates.collect { case (n, gs) if gs.isEmpty => n }
    assert(empty.isEmpty,
      s"queries with NO gate (add oracle SQL or a rowsOnlyGates entry): ${empty.toSeq.sorted}")
  }

  test("oracle-gated queries are exactly the oracleSql keys") {
    val oracleGated = SparkEntry.gates.collect {
      case (n, gs) if gs.contains("oracle") => n
    }.toSet
    assert(oracleGated == SparkEntry.oracleSql.keySet)
  }

  test("every named golden/spec gate resolves to an existing suite class") {
    val suites = SparkEntry.gates.values.flatten.toSeq.distinct
      .filterNot(_ == "oracle")
      .map(_.split(":", 2)(1))
    val missing = suites.filterNot { s =>
      try { Class.forName(s"graft.$s"); true }
      catch { case _: ClassNotFoundException => false }
    }
    assert(missing.isEmpty, s"gates name suites that do not exist: $missing")
  }

  test("rowsOnlyGates is minimal: no dead entries for oracle-gated or unregistered queries") {
    // the inverse-drift check (r16 VERDICT): `gates` masks a stale
    // rowsOnlyGates entry because oracleSql wins, so a query promoted
    // to a full oracle would silently keep its dead rows-only entry
    val shadowed = SparkEntry.rowsOnlyGates.keySet intersect SparkEntry.oracleSql.keySet
    assert(shadowed.isEmpty,
      s"rowsOnlyGates entries shadowed by an oracle — delete them: ${shadowed.toSeq.sorted}")
    val unregistered = SparkEntry.rowsOnlyGates.keySet -- SparkEntry.queries.keySet
    assert(unregistered.isEmpty,
      s"rowsOnlyGates entries for unregistered queries: ${unregistered.toSeq.sorted}")
  }

  test("committed gates.json matches the live SparkEntry.gates") {
    val committed = scala.io.Source.fromFile("gates.json", "UTF-8").mkString.trim
    assert(committed == SparkEntry.gatesJson,
      "gates.json is stale — regenerate it from SparkEntry.gatesJson " +
        "(sbt 'runMain graft.tools.WriteGates')")
  }

  test("COVERAGE.md's rows-only list matches the registered non-oracle set") {
    val text = scala.io.Source.fromFile("COVERAGE.md", "UTF-8").mkString
    val start = text.indexOf("(rows-only:")
    assert(start >= 0, "COVERAGE.md lost its '(rows-only:' totals marker")
    val listed = text.substring(start + "(rows-only:".length,
        text.indexOf("—", start))
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    val actual = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(listed == actual,
      s"COVERAGE.md rows-only drift: listed-but-not-registered=${listed -- actual}, " +
        s"registered-but-unlisted=${actual -- listed}")
  }
}
