package graft

import org.apache.spark.sql.SparkSession

/** JVM-global memo for SESSION-BOUND values (checkpointed DataFrames,
  * index frames): the key always includes the owning session's UUID —
  * a localCheckpoint'd frame is backed by blocks of the session that
  * computed it, so a later or different session must recompute, never
  * receive a frame whose blocks may be gone.
  *
  * The compute runs OUTSIDE the map lock (`computeIfAbsent` would hold
  * the bin lock across a full Spark job, serializing unrelated callers
  * that hash to the same bin); a concurrent duplicate compute is benign
  * — `putIfAbsent` keeps the first, both values are valid. Entries for
  * stopped sessions are never returned (their key is never asked for
  * again) and hold bounded frames — residue reclaimed at JVM exit.
  */
final class SessionMemo[V <: AnyRef] {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, V]()

  def getOrCompute(spark: SparkSession, key: String)(body: => V): V = {
    val sid = org.apache.spark.sql.graft.ColumnBridge.sessionUUID(spark)
    val full = s"$sid|$key"
    val hit = m.get(full)
    if (hit != null) hit
    else {
      val computed = body
      val prev = m.putIfAbsent(full, computed)
      if (prev != null) prev else computed
    }
  }
}
