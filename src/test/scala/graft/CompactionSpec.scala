package graft

import graft.operators.Scale

/** Compaction and schema evolution: layout rewrites must change file
  * counts, never answers. */
class CompactionSpec extends SparkSpec {

  private def dataFiles(dir: String): Int =
    new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))

  test("compaction collapses the fragmented layout and preserves the aggregate") {
    // re-run the operator's two writes explicitly so the file counts are
    // observable, then hold its result invariant against the raw table
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact_spec").toString
    val e = Tables.load(spark, sf, "events")
      .select("event_id", "event_type", "value")
    e.repartition(64).write.mode("overwrite").parquet(s"$tmp/small")
    spark.read.parquet(s"$tmp/small").repartition(4)
      .write.mode("overwrite").option("maxRecordsPerFile", 2000000)
      .parquet(s"$tmp/compact")
    val nSmall = dataFiles(s"$tmp/small")
    val nCompact = dataFiles(s"$tmp/compact")
    assert(nSmall === 64)
    assert(nCompact <= nSmall / 8, s"compaction left $nCompact files of $nSmall")
    val raw = e.count()
    val back = spark.read.parquet(s"$tmp/compact").count()
    assert(back === raw)
  }

  test("schema evolution null-fills the pre-evolution files only") {
    val out = Scale.schemaEvolutionRead(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.contains("PRE-SCHEMA"), s"missing null-filled bucket: $out")
    assert(out.keySet.exists(_ != "PRE-SCHEMA"), "evolved column never read")
    val total = Tables.load(spark, sf, "orders").count()
    assert(out.values.sum === total, s"rows lost across the merge: $out")
  }
}
