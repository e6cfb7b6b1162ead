package graft

import org.apache.spark.sql.functions._
import graft.operators.Scale

/** Z-order layout: the Morton interleave must be correct bit-for-bit,
  * and the z-sorted parquet copy must actually SKIP row groups under a
  * 2-D selective filter where an unsorted copy scans everything. */
class ZorderSpec extends SparkSpec {

  test("morton16 interleaves bits: x at even positions, y at odd") {
    val s = spark; import s.implicits._
    val cases = Seq(
      (0L, 0L, 0L),
      (1L, 0L, 1L),   // x bit 0 -> position 0
      (0L, 1L, 2L),   // y bit 0 -> position 1
      (1L, 1L, 3L),
      (2L, 0L, 4L),   // x bit 1 -> position 2
      (0L, 2L, 8L),   // y bit 1 -> position 3
      (3L, 3L, 15L))  // full low quad
    val got = cases.toDF("x", "y", "want")
      .withColumn("z", Scale.morton16(col("x"), col("y")))
      .collect()
    got.foreach(r => assert(r.getAs[Long]("z") == r.getAs[Long]("want"),
      s"morton(${r.getAs[Long]("x")}, ${r.getAs[Long]("y")})"))
    // max 16-bit x alone = 0101...01 over 32 bits
    val maxX = Seq((65535L, 0L)).toDF("x", "y")
      .select(Scale.morton16(col("x"), col("y"))).head().getLong(0)
    assert(maxX == 0x55555555L, f"morton(65535,0) = $maxX%x")
    val maxY = Seq((0L, 65535L)).toDF("x", "y")
      .select(Scale.morton16(col("x"), col("y"))).head().getLong(0)
    assert(maxY == 0xAAAAAAAAL, f"morton(0,65535) = $maxY%x")
  }

  test("z-sorted layout skips row groups; unsorted layout scans all") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_zspec").toString
    val e = Tables.load(spark, sf, "events")
      .select("event_id", "user_id", "value")
    val total = e.count()
    val z = e.withColumn("z", Scale.morton16(
      pmod(col("user_id"), lit(65536L)),
      floor(col("value") * 100).cast("long")))
    z.repartitionByRange(16, col("z")).sortWithinPartitions("z").drop("z")
      .write.mode("overwrite").parquet(s"$tmp/zsorted")
    // same data, same file count, deliberately scrambled layout
    z.repartition(16, pmod(col("event_id"), lit(16))).drop("z")
      .write.mode("overwrite").parquet(s"$tmp/unsorted")

    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scanRows(path: String): (Long, Long) = {
      val df = spark.read.parquet(path)
        .filter(col("user_id").between(3, 5) && col("value").between(100.0, 150.0))
      val n = df.collect().length.toLong
      def findScan(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => findScan(a.executedPlan)
        case q: QueryStageExec => findScan(q.plan)
        case s: FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(findScan)
      }
      val scan = findScan(df.queryExecution.executedPlan)
      assert(scan.nonEmpty, "no FileSourceScanExec found")
      (n, scan.map(_.metrics("numOutputRows").value).sum)
    }
    val (nZ, scannedZ) = scanRows(s"$tmp/zsorted")
    val (nU, scannedU) = scanRows(s"$tmp/unsorted")
    assert(nZ == nU, s"layout changed the answer: $nZ vs $nU rows")
    // unsorted: every row group overlaps the filter -> scans ~everything
    assert(scannedU >= total * 9 / 10, s"unsorted scanned $scannedU of $total")
    // z-sorted: footer min/max skip most row groups
    assert(scannedZ * 2 <= scannedU,
      s"z-sorted scanned $scannedZ, unsorted $scannedU — no skipping effect")
  }
}
