package graft


/** Driver-contract hygiene: the oracle map must stay consistent with the
  * query map (a dangling oracle or misnamed query silently weakens t2). */
class ContractSpec extends SparkSpec {

  /** Data-drift tripwire: the testdata has been regenerated mid-round
    * before with a DIFFERENT physical timestamp unit (nanos → micros),
    * which the old unit-assuming loader decoded as 1970 dates — 21 silent
    * wrong-answer oracles instead of one loud failure. Pin the decoded
    * event-time span at every scale factor so a future unit flip (or any
    * generator change that moves the epoch) fails HERE first. */
  test("events ts decodes to a sane year range at every scale factor") {
    import org.apache.spark.sql.functions._
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { s =>
      val dir = s"$sfBase/$s"
      if (new java.io.File(s"$dir/events.parquet").exists) {
        val r = Tables.load(spark, dir, "events")
          .agg(year(min(col("ts"))).as("lo"), year(max(col("ts"))).as("hi"))
          .head()
        val (lo, hi) = (r.getInt(0), r.getInt(1))
        assert(lo >= 2020 && hi <= 2030,
          s"$s: events ts decodes to years [$lo, $hi] — timestamp unit drift?")
      }
    }
  }

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
    // like "SUM(x)," at top level (heuristic guard). A scalar subquery
    // `(SELECT COUNT(*) ...)` is exempt — its VALUE is aliased where it
    // is used — as is a non-first UNION ALL branch, whose column names
    // come from the first branch.
    // Only the SELECT list of a non-first UNION ALL branch is exempt —
    // everything after that branch's FROM (later CTEs, the final SELECT)
    // is still scanned, so an unaliased aggregate downstream of an early
    // CTE's UNION ALL cannot hide.
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val parts = sql.split("(?i)UNION\\s+ALL")
      val scanned = parts.head +: parts.tail.map { p =>
        "(?i)\\bFROM\\b".r.findFirstMatchIn(p)
          .map(m => p.substring(m.start)).getOrElse("")
      }
      // paren-BALANCED scan, not a [^)]* regex: the character class stops
      // at the first ')' inside a nested call, so SUM(COALESCE(x,0)) —
      // the most common real aggregate form — could never match and was
      // silently exempt from the guard
      val start = "(?i)(?<!\\()SELECT\\s+(SUM|COUNT|AVG|MIN|MAX)\\(".r
      def unaliasedAt(seg: String, openIdx: Int): Boolean = {
        var i = openIdx; var depth = 0
        while (i < seg.length && (depth > 0 || i == openIdx)) {
          if (seg(i) == '(') depth += 1
          else if (seg(i) == ')') depth -= 1
          i += 1
        }
        if (depth != 0) return false // unbalanced — not this guard's job
        val rest = seg.substring(i).dropWhile(_.isWhitespace)
        rest.startsWith(",") || rest.toUpperCase.startsWith("FROM")
      }
      scanned.foreach { seg =>
        start.findAllMatchIn(seg).foreach { m =>
          assert(!unaliasedAt(seg, m.end - 1),
            s"$name: unaliased aggregate in oracle SQL near ...${seg.substring(m.start, math.min(seg.length, m.start + 60))}...")
        }
      }
    }
  }
}
