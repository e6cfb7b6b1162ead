package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract hygiene: the oracle map must stay consistent with the
  * query map (a dangling oracle or misnamed query silently weakens t2). */
class ContractSpec extends AnyFunSuite {

  test("every oracle key has a query implementation") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("query names are unique, prefixed q_, and non-empty maps") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.nonEmpty && names.distinct.size == names.size)
    assert(names.forall(_.startsWith("q_")))
  }

  test("oracle SQL contains no unaliased aggregate column leaks") {
    // Every SELECT list item the hash compare sees must carry a stable
    // name: reject oracle text containing obviously unaliased aggregates
    // like "SUM(x)," at top level (heuristic guard).
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val bad = "(?i)SELECT\\s+(SUM|COUNT|AVG|MIN|MAX)\\([^)]*\\)\\s*(,|FROM)".r
        .findFirstIn(sql)
      assert(bad.isEmpty, s"$name: unaliased aggregate in oracle SQL")
    }
  }
}
