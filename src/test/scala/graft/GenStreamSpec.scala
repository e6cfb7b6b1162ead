package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types.DecimalType

/** The generator source's micro-batch face: streamed totals must equal
  * the batch read's, arrive across MULTIPLE admission-controlled
  * batches, and survive a checkpointed stop/restart without replaying
  * or losing ids (offset-log exactly-once). */
class GenStreamSpec extends SparkSpec {

  private def agg(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total"))

  test("streamed generator totals == batch totals, over several micro-batches") {
    val stream = spark.readStream.format("graft.sources.RangeGenSource")
      .option("rows", "20000").option("batchRows", "2500").load()
    val name = s"gen_stream_${System.nanoTime()}"
    val q = agg(stream).writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table(name).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val want = agg(spark.read.format("graft.sources.RangeGenSource")
      .option("rows", "20000").load()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
    // 20000 ids / 2500 per trigger → the offset log must show real
    // micro-batching, not one mega-batch
    assert(q.recentProgress.length >= 4,
      s"expected several batches, saw ${q.recentProgress.length}")
  }

  test("checkpointed stream restart: no replay, no loss") {
    val dir = java.nio.file.Files.createTempDirectory("gen_ckpt").toString
    def start(sink: String, rows: Long) = {
      val stream = spark.readStream.format("graft.sources.RangeGenSource")
        .option("rows", rows.toString).option("batchRows", "1000").load()
      agg(stream).writeStream.outputMode(OutputMode.Complete())
        .option("checkpointLocation", s"$dir/ckpt")
        .format("memory").queryName(sink)
        .trigger(Trigger.AvailableNow()).start()
    }
    // run 1 drains ids [0, 5000); "more data arrives" while the query is
    // down (the range grows to 10000); run 2 reopens the SAME checkpoint
    val q1 = start("gen_ckpt_1", 5000)
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.table("gen_ckpt_1").agg(sum("n")).head().getLong(0) == 5000L)
    val q2 = start("gen_ckpt_2", 10000)
    try q2.processAllAvailable() finally q2.stop()
    // state restore + offset log: totals cover ALL 10000 ids exactly once…
    val t2 = spark.table("gen_ckpt_2").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val want = agg(spark.read.format("graft.sources.RangeGenSource")
      .option("rows", "10000").load()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(t2 == want, "restarted totals must equal one continuous run")
    // …while run 2 only READ the 5000 new ids (no replay of [0, 5000))
    val replayed = q2.recentProgress.map(_.numInputRows).sum
    assert(replayed == 5000L, s"run 2 read $replayed rows, expected 5000")
  }
}
