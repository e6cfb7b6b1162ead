package graft

import graft.operators.Scale

/** Compaction and schema evolution: layout rewrites must change file
  * counts, never answers. */
class CompactionSpec extends SparkSpec {

  private def dataFiles(dir: String): Int =
    new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))

  test("compaction collapses the fragmented layout and preserves the aggregate") {
    // run the OPERATOR with an observable output root, so a future change
    // to its repartition/maxRecordsPerFile settings is caught here — the
    // file counts below are the operator's own writes, not a re-creation
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact_spec").toString
    val result = Scale.compactionRoundTrip(spark, sf, tmp).collect()
    val nSmall = dataFiles(s"$tmp/small")
    val nCompact = dataFiles(s"$tmp/compact")
    assert(nSmall === 64)
    assert(nCompact <= nSmall / 8, s"compaction left $nCompact files of $nSmall")
    // result invariance against the raw table
    val raw = Tables.load(spark, sf, "events").count()
    assert(result.head.getLong(0) === raw)
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
