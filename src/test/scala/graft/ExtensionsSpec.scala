package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-function plugin path: a session built with GraftExtensions can
  * call the native expressions from SQL text. */
class ExtensionsSpec extends AnyFunSuite {

  // getOrCreate may return a pre-existing session (other suites share the
  // JVM), where builder-time withExtensions is silently ignored — use the
  // runtime registration path, which covers the same injected functions.
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    GraftExtensions.register(s)
    s
  }

  test("simhash64 and dot_product are callable from SQL text") {
    val r = spark.sql(
      """SELECT simhash64(array(CAST(5 AS BIGINT))) AS sh,
        |       dot_product(array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)),
        |                   array(CAST(3.0 AS DOUBLE), CAST(4.0 AS DOUBLE))) AS dp""".stripMargin)
      .head()
    assert(r.getLong(0) == 5L) // singleton simhash == the hash itself
    assert(r.getDouble(1) == 11.0)
  }
}
