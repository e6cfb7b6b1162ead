package graft

import graft.operators.Multimodal
import graft.streaming.EventsStream
import org.apache.spark.sql.functions._

class MultimodalStreamSpec extends SparkSpec {

  test("media table has real binary payloads with typed metadata") {
    val m = Multimodal.mediaTable(spark, sf)
    assert(m.schema("payload").dataType.typeName == "binary")
    val r = m.filter(col("media_id") === 3).head()
    assert(r.getAs[String]("kind") == "image") // 3 % 3 == 0
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getAs[Int]("sample_rate") == 16000)
  }

  test("batched decode produces 16-dim features, stable across partitionings") {
    val f1 = Multimodal.decodeFeatures(spark, sf)
      .orderBy("media_id").collect()
    assert(f1.forall(_.getSeq[Double](2).length == 16))
    val f2 = Multimodal.decodeFeatures(spark, sf)
      .repartition(7).orderBy("media_id").collect()
    assert(f1.map(_.getSeq[Double](2)).toSeq == f2.map(_.getSeq[Double](2)).toSeq)
  }

  test("resize pools 16 -> 4 dims; frame sampling strides the payload") {
    val resized = Multimodal.resize(Multimodal.decodeFeatures(spark, sf)).head()
    assert(resized.getSeq[Double](resized.fieldIndex("features_4")).length == 4)
    val frames = Multimodal.frameSample(spark, sf, stride = 10)
    val r = frames.head()
    // n_frames > 0 and the checksum is bounded by 255 * n_frames
    assert(r.getInt(1) > 0 && r.getLong(2) <= 255L * r.getInt(1))
  }

  test("streamed hourly agg equals the batch aggregation") {
    val streamed = EventsStream.hourlyCounts(spark, sf)
      .orderBy("bucket_start", "event_type").collect().map(_.toSeq).toSeq
    val batch = graft.operators.Breadth.eventsHourly(spark, sf)
      .orderBy("bucket_start", "event_type").collect().map(_.toSeq).toSeq
    assert(streamed == batch)
  }

  test("sessionization: every user summarized once, sessions <= events") {
    val s = EventsStream.sessionize(spark, sf).collect()
    val users = s.map(_.getLong(0))
    assert(users.distinct.length == users.length)
    s.foreach(r => assert(r.getInt(1) >= 1 && r.getInt(1) <= r.getInt(2)))
  }
}
