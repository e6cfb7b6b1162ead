package graft

import org.apache.spark.sql.SparkSession

/** Streaming STATE-SIZE probe at an arbitrary scale point — the third
  * measurement the two-point SCALEBENCH table cannot provide: two
  * points always fit a line, three distinguish the claimed boundedness
  * laws (watermark-bounded join state vs user-bounded session state vs
  * key-bounded window state) from coincidence. Runs the stateful
  * streaming queries against a dir and prints each query's peak
  * RocksDB state footprint (rows/bytes from the progress metrics).
  *
  * Usage: runMain graft.StateProbe <dir> [q1,q2,...]
  */
object StateProbe {
  private val Default = Seq(
    "q_stream_stream_join", "q_stream_stream_outer",
    "q_stream_sessions_timers", "q_stream_hourly", "q_stream_sliding",
    "q_stream_sessions", "q_stream_sessions_tws", "q_stream_hll_daily")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val qs = if (args.length > 1) args(1).split(",").toSeq else Default
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.streaming.EventsStream.warmStateStore(spark)
    catch { case e: Throwable => System.err.println(s"[probe] rocks warm-up failed: $e") }
    qs.foreach { n =>
      graft.streaming.EventsStream.lastStateFootprint = None
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val fp = graft.streaming.EventsStream.lastStateFootprint
      println(f"STATE $n%-28s dir=$dir rows=$rows%7d sec=$sec%7.2f " +
        fp.map(f => s"state_rows=${f.rows} state_bytes=${f.bytes}")
          .getOrElse("state=none"))
    }
    spark.stop()
  }
}
