package graft

import org.apache.spark.sql.functions._

/** Pins the reference's semantic quirks (SURVEY.md §2.9) so an "idiomatic
  * cleanup" can never silently change them. */
class QuirkSpec extends SparkSpec {

  test("Q1: to_date with 'yyyy-mm-dd' (mm = minutes) parses 2016-06-16 as 2016-01-16") {
    // /root/reference/utils/kmeans_utils.py:30 — reproduced bug-for-bug.
    val d = spark.range(1)
      .select(to_date(lit("2016-06-16"), "yyyy-mm-dd").cast("string").as("d"))
      .head().getString(0)
    assert(d == "2016-01-16")
  }

  test("Q4: natural log of non-positive values is null, not NaN/error") {
    // /root/reference/utils/kmeans_utils.py:63-64 + na.fill(0) interplay.
    val rows = spark.range(1)
      .select(log(lit(0.0)).as("l0"), log(lit(-1.0)).as("ln"), log(lit(Math.E)).as("l1"))
      .head()
    assert(rows.isNullAt(0) && rows.isNullAt(1))
    assert(math.abs(rows.getDouble(2) - 1.0) < 1e-12)
  }

  test("Q2: age uses /365 not /365.25") {
    val age = graft.operators.Relational.ageDerivation(spark, sf)
      .filter(col("orderkey") === 1).head().getDouble(1)
    // 365-day years produce ages slightly above the true calendar value.
    assert(age > 0)
    val reconstructed = math.round(age * 365).toDouble / 365
    assert(math.abs(age - reconstructed) < 1e-12)
  }

  test("Q1 flag: referenceQuirks=true shifts every age by ~5 months, default mode does not") {
    // Flag ON reproduces the reference's 'yyyy-mm-dd' anchor parse
    // (2016-06-16 read as 2016-01-16): each age drops by exactly
    // datediff(2016-06-16, 2016-01-16) = 152 days = 152/365 years.
    val fixed = graft.operators.Relational.ages(spark, sf)
      .withColumnRenamed("age", "age_fixed")
    val quirk = graft.operators.Relational.ages(spark, sf, referenceQuirks = true)
      .withColumnRenamed("age", "age_quirk")
    val joined = fixed.join(quirk, "custkey")
      .select((col("age_fixed") - col("age_quirk")).as("delta")).collect()
    assert(joined.nonEmpty)
    assert(joined.forall(r => math.abs(r.getDouble(0) - 152.0 / 365.0) < 1e-9))
    // and the flag threads through the flagship pipeline
    val cfQuirk = graft.operators.Relational
      .customerFeatures(spark, sf, referenceQuirks = true)
    val cfFixed = graft.operators.Relational.customerFeatures(spark, sf)
    val d = cfFixed.select(col("custkey"), col("age").as("a1"))
      .join(cfQuirk.select(col("custkey"), col("age").as("a2")), "custkey")
      .select((col("a1") - col("a2")).as("delta")).collect()
    assert(d.forall(r => math.abs(r.getDouble(0) - 152.0 / 365.0) < 1e-9))
  }

  test("Q6: a multi-valued strengths dim duplicates feature rows through the left join") {
    val df = graft.operators.Relational.customerFeaturesMulti(spark, sf)
    val rows = df.count()
    val users = df.select("custkey").distinct().count()
    assert(rows > users,
      s"expected duplicated feature rows (Q6), got rows=$rows users=$users")
  }

  test("Q5: na.fill(0) is blanket — customers absent from strengths get 0.0") {
    val df = graft.operators.Relational.customerFeatures(spark, sf)
    assert(df.schema("strength").dataType.typeName == "double")
    assert(df.filter(col("strength").isNull).count() == 0)
  }
}
