package graft

import org.apache.spark.sql.functions._

/** Multi-batch robustness of the timer-driven sessionizer
  * ([[graft.streaming.EventsStream.sessionizeTimers]]): the oracled query
  * replays the corpus in ONE micro-batch, which can't exercise the
  * close/re-arm/buffer logic. Here events arrive across FOUR time-ordered
  * micro-batches (`maxFilesPerTrigger=1`, files written in event-time
  * order with distinct mod-times), so the watermark advances
  * progressively and timers fire MID-stream: early sessions emit while
  * later events are still unread, boundary-spanning sessions stay
  * buffered and re-arm. The union of emissions must equal the exact
  * batch session table — same rows, same session ids. */
class TimerSessionSpec extends SparkSpec {

  test("timer sessions across 4 progressive micro-batches == batch session table") {
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
    val dirS = java.nio.file.Files.createTempDirectory("graft_timer_spec").toString
    val mm = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val cut1 = lo + (hi - lo) / 3
    val cut2 = lo + 2 * (hi - lo) / 3
    def writeSlice(pred: org.apache.spark.sql.Column): Unit = {
      ev.filter(pred).coalesce(1).write.mode("append").parquet(dirS)
      Thread.sleep(1100) // distinct mod-times → deterministic file order
    }
    writeSlice(unix_micros(col("ts")) <= cut1)
    writeSlice(unix_micros(col("ts")) > cut1 && unix_micros(col("ts")) <= cut2)
    writeSlice(unix_micros(col("ts")) > cut2)
    // watermark-driving sentinel, 3 h past the end, arrives LAST
    spark.range(1).select(lit(-1L).as("event_id"),
        timestamp_micros(lit(hi + 10800000000L)).as("ts"),
        lit(-1L).as("user_id"), lit("click").as("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("append").parquet(dirS)

    import spark.implicits._
    val src = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(dirS)
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[graft.streaming.EventsStream.TimerEvent]
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5))).toSet
    val got = asSet(graft.streaming.EventsStream
      .runTimerSessions(spark, src, 30 * 60L * 1000000L))
    val want = asSet(graft.operators.Breadth.sessionizeBatch(spark, sf))
    assert(got.nonEmpty)
    assert(got == want,
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)} " +
        s"(${got.size} vs ${want.size} rows)")
  }
}
