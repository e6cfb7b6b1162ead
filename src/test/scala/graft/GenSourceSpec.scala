package graft

import org.apache.spark.sql.functions._

/** Pins the DataSource V2 generator source's contract: range-filter
  * pushdown narrows the GENERATED id range (compute-side pruning),
  * column pruning reaches the reader, partition planning honors
  * `slices`, and the generated data is deterministic. */
class GenSourceSpec extends SparkSpec {

  private def gen(rows: Long = 10000, slices: Int = 4) =
    spark.read.format("graft.sources.RangeGenSource")
      .option("rows", rows.toString).option("slices", slices.toString).load()

  test("range predicates prune the generated id range, results unchanged") {
    val pruned = gen().filter(col("event_id") >= 1000 && col("event_id") < 3000)
    // the scan itself must carry the narrowed range in its description
    val planned = pruned.queryExecution.executedPlan.toString
    assert(planned.contains("RangeGen(pushed=[1000,3000)"),
      s"pushdown missing from plan:\n$planned")
    // and the pruned read must equal a client-side filter of the full read
    val full = gen().collect().filter { r =>
      val id = r.getLong(0); id >= 1000 && id < 3000
    }.toSet
    assert(pruned.collect().toSet == full)
    assert(pruned.count() == 2000)
  }

  test("column pruning reaches the reader") {
    val skinny = gen().select("value")
    val planned = skinny.queryExecution.executedPlan.toString
    assert(planned.contains("cols=value"), s"column pruning missing:\n$planned")
    assert(skinny.schema.fieldNames.toSeq == Seq("value"))
    assert(skinny.count() == 10000)
  }

  test("partition planning honors slices; rows are deterministic") {
    assert(gen(10000, 4).rdd.getNumPartitions == 4)
    assert(gen(10, 32).rdd.getNumPartitions == 10, "empty slices dropped")
    val a = gen().collect().map(_.toString).sorted
    val b = gen().collect().map(_.toString).sorted
    assert(a.sameElements(b))
    // spot-check the id→row arithmetic the oracle mirrors
    val r7 = gen().filter(col("event_id") === 7).head()
    assert(r7.getLong(1) == 7 % 97)
    assert(r7.getString(2) == graft.sources.RangeGenSource.EventTypes(((7L * 31) % 5).toInt))
    assert(r7.getDouble(3) == ((7L * 2654435761L) % 100000L) / 100.0)
  }
}
