package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Optimization-round instrument (guide §1): runs the named queries under
  * the EXACT Bench session config and attributes each query's wall time to
  * scheduled work vs driver/planning gap, with per-stage executor time,
  * task counts and shuffle bytes. A query whose wall ≫ Σ stage time is
  * bottlenecked on the driver (planning, many small sequential jobs from
  * eager checkpoints, codegen); one whose time sits in a single stage's
  * executor time names the operator to fix. Read-only: no artifact, no
  * effect on declared queries. Usage:
  *   sbt "runMain graft.Profile q_triangle_count q_dedup_summary"
  * (default: the whole bench sweep, two passes, second-pass attribution —
  * i.e. steady-state per the bench's min-of-2 protocol). */
object Profile {
  private class Acc extends SparkListener {
    case class St(var name: String = "", var tasks: Int = 0,
      var execRunMs: Long = 0, var shufReadB: Long = 0, var shufWriteB: Long = 0,
      var inputB: Long = 0, var wallMs: Long = 0)
    val stages = mutable.LinkedHashMap[Int, St]()
    var jobs = 0
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val i = sc.stageInfo
      val st = stages.getOrElseUpdate(i.stageId, new St)
      st.name = i.name.takeWhile(_ != '\n')
      st.tasks += i.numTasks
      st.wallMs += (for {a <- i.completionTime; b <- i.submissionTime} yield a - b).getOrElse(0L)
      val m = i.taskMetrics
      st.execRunMs += m.executorRunTime
      st.shufReadB += m.shuffleReadMetrics.totalBytesRead
      st.shufWriteB += m.shuffleWriteMetrics.bytesWritten
      st.inputB += m.inputMetrics.bytesRead
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    try graft.streaming.EventsStream.warmStateStore(spark)
    catch { case _: Throwable => }
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    // pass 1: warm-up (memo builds, codegen). pass 2: attributed.
    names.foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        try fn(spark, sfDir).count() catch { case e: Throwable =>
          System.err.println(s"[profile] warm $n failed: ${e.getMessage}") }
      }
    }
    // GRAFT_PROFILE_COLD=1 (round 22): clear session memos before each
    // measured query so pass 2 attributes the BUILD cost of memoized
    // intermediates (the de-gamed bench's standalone view) instead of
    // the memo-hit time. Default stays warm — the steady-state view.
    val cold = sys.env.get("GRAFT_PROFILE_COLD").contains("1")
    val rows = names.flatMap { n =>
      SparkEntry.queries.get(n).map { fn =>
        if (cold) SessionMemo.clearAllForSession(spark)
        val acc = new Acc
        spark.sparkContext.addSparkListener(acc)
        spark.sparkContext.setJobDescription(n)
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
        val wall = (System.nanoTime() - t0) / 1e6
        // listener bus is async: drain before reading
        org.apache.spark.graft.ListenerBridge.waitUntilEmpty(spark.sparkContext)
        spark.sparkContext.removeSparkListener(acc)
        spark.sparkContext.setJobDescription(null)
        (n, ok, wall, acc)
      }
    }
    println(f"%nQUERY SUMMARY (pass 2, steady-state)  wall = driver wall; stageWall = Σ stage clock; exec = Σ task executor time")
    println(f"${"query"}%-32s ${"wall_ms"}%9s ${"jobs"}%5s ${"stages"}%6s ${"tasks"}%6s ${"stageWall"}%9s ${"exec_ms"}%8s ${"shufR_MB"}%9s ${"in_MB"}%7s")
    rows.sortBy(-_._3).foreach { case (n, ok, wall, a) =>
      val ts = a.stages.values
      println(f"$n%-32s ${wall.toLong}%9d ${a.jobs}%5d ${ts.size}%6d ${ts.map(_.tasks).sum}%6d " +
        f"${ts.map(_.wallMs).sum}%9d ${ts.map(_.execRunMs).sum}%8d " +
        f"${ts.map(_.shufReadB).sum / 1e6}%9.1f ${ts.map(_.inputB).sum / 1e6}%7.1f" +
        (if (ok) "" else "  FAILED"))
    }
    // per-stage detail for explicitly named queries only (arg mode)
    if (args.nonEmpty) rows.foreach { case (n, _, wall, a) =>
      println(s"\n---- $n (wall ${wall.toLong} ms, ${a.jobs} jobs) ----")
      a.stages.toSeq.sortBy(-_._2.wallMs).take(12).foreach { case (id, s) =>
        println(f"  stage $id%4d wall ${s.wallMs}%6d ms exec ${s.execRunMs}%7d ms " +
          f"tasks ${s.tasks}%4d shufR ${s.shufReadB / 1e6}%8.1f MB shufW ${s.shufWriteB / 1e6}%8.1f MB " +
          f"in ${s.inputB / 1e6}%7.1f MB  ${s.name.take(60)}")
      }
    }
    spark.stop()
  }
}
