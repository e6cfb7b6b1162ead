package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session: one per suite, pinned partitioning + UTC like the
  * driver's Verify session. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  /** Testdata root — overridable for machines/CI where the driver's
    * layout lives elsewhere; suites that need a specific scale derive it
    * from here (never a hardcoded absolute path). */
  val sfBase: String = sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")
  val sf: String = s"$sfBase/sf0.001"
}
