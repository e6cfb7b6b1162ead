package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types.DecimalType

/** True INCREMENTAL streaming semantics: two parquet files arrive as two
  * micro-batches (maxFilesPerTrigger=1); the watermark advances after
  * batch 1 and append-mode emits exactly the windows that closed. The
  * one-batch memory-sink tests can't see this — this spec proves the
  * watermark/late-data machinery works across batches. */
class IncrementalStreamSpec extends SparkSpec {

  test("append-mode windows emit incrementally as the watermark advances") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("inc_stream").toString
    val srcDir = s"$dir/src"
    new java.io.File(srcDir).mkdirs()

    // batch 1: hours 0 and 1; batch 2: hours 3 and 4 (of 2024-01-01)
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val batch1 = Seq((1L, ts(0, 10), 1.0), (2L, ts(0, 50), 2.0), (3L, ts(1, 15), 3.0))
    val batch2 = Seq((4L, ts(3, 5), 4.0), (5L, ts(4, 20), 5.0))
    batch1.toDF("event_id", "ts", "value").coalesce(1).write.parquet(s"$srcDir/b1")
    batch2.toDF("event_id", "ts", "value").coalesce(1).write.parquet(s"$srcDir/b2")
    // Move files into one flat dir with ordered names so b1 triggers first.
    val flat = s"$dir/flat"
    new java.io.File(flat).mkdirs()
    def move(sub: String, name: String): Unit = {
      val f = new java.io.File(s"$srcDir/$sub").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(f.toPath, java.nio.file.Paths.get(s"$flat/$name"))
    }
    move("b1", "part-0001.parquet")
    move("b2", "part-0002.parquet")

    val src = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, value DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .parquet(flat)
    val agg = src
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total"))
      .select(unix_timestamp(col("window.start")).as("wstart"), col("n"), col("total"))
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("inc_out")
      .trigger(Trigger.AvailableNow()).start()
    try q.processAllAvailable() finally q.stop()

    val rows = spark.table("inc_out").orderBy("wstart").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val h = 3600L
    val base = ts(0, 0).getTime / 1000
    // After both batches: max event time = 04:20, watermark = 03:20 →
    // windows [00,01) [01,02) [03,04)? window [03,04) closes only at wm ≥ 04:00
    // → emitted: hour-0 (n=2, 3.0) and hour-1 (n=1, 3.0).
    assert(rows.contains((base, 2L, 3.0)), s"got ${rows.toSeq}")
    assert(rows.contains((base + h, 1L, 3.0)), s"got ${rows.toSeq}")
    // hour-4 window can never emit (watermark stops at 03:20); hour-3 may
    // emit only if a final empty batch advanced the watermark — assert it
    // did NOT emit hour-4.
    assert(!rows.exists(_._1 == base + 4 * h), s"got ${rows.toSeq}")
  }

  test("streaming incremental dedup equals the batch run exactly") {
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)), r.getInt(3))).toSet
    val streamed = asSet(
      graft.streaming.EventsStream.streamIncrementalDedup(spark, sf))
    val batch = asSet(graft.operators.Dedup.dedupIncremental(spark, sf))
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"missing=${batch -- streamed} extra=${streamed -- batch}")
  }

  test("incremental verdicts are batch-composition independent") {
    // the property that makes the streaming union exact regardless of
    // micro-batch boundaries: verdicts depend only on (doc, corpus),
    // so verdicts(half1) ∪ verdicts(half2) == verdicts(whole)
    import org.apache.spark.sql.functions._
    val src = Tables.load(spark, sf, "documents").select("doc_id", "source")
    val sh = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang"),
        graft.functions.HashExpressions
          .shingle_hash(split(col("text"), " "), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .join(src, "doc_id")
    val newDocs = sh.filter(col("source") === "src1")
    val corpus = sh.filter(col("source") =!= "src1")
    val allNew = Tables.load(spark, sf, "documents")
      .filter(col("source") === "src1").select("doc_id")
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)), r.getInt(3))).toSet
    val whole = asSet(graft.operators.Dedup.incrementalVerdicts(
      newDocs, corpus, allNew, 0.2, 1000L))
    val h1 = asSet(graft.operators.Dedup.incrementalVerdicts(
      newDocs.filter(col("doc_id") % 2 === 0), corpus,
      allNew.filter(col("doc_id") % 2 === 0), 0.2, 1000L))
    val h2 = asSet(graft.operators.Dedup.incrementalVerdicts(
      newDocs.filter(col("doc_id") % 2 === 1), corpus,
      allNew.filter(col("doc_id") % 2 === 1), 0.2, 1000L))
    assert((h1 ++ h2) == whole,
      s"missing=${whole -- (h1 ++ h2)} extra=${(h1 ++ h2) -- whole}")
  }
}
