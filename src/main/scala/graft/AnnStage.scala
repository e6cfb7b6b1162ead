package graft

import org.apache.spark.sql.SparkSession

/** Stage an embeddings-ONLY scaled corpus — the ANN calibration third
  * scale point (round 16): `runMain graft.AnnStage <src> <out> <copies>`
  * replicates `src/embeddings.parquet` `copies`× with per-copy id
  * offsets and sign-flip rotations (the exact [[ScaleBench]] staging,
  * shared code) into `out/embeddings.parquet`. [[AnnCalibrate]] and the
  * ANN queries only read the embeddings table, so the other tables are
  * not staged. Parameter-stamped like the full staged corpus so a rerun
  * with different copies fails loudly instead of silently benching
  * stale tables. */
object AnnStage {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_emb100"
    // named parse failure + positivity guard (round-20 review): a typo'd
    // copies arg died as a bare NumberFormatException, and copies <= 0
    // would param-stamp an empty staging that later runs would trust.
    // Digit-count bound (round-21 ADVICE): \d+ alone admits values that
    // overflow Int, so toInt still threw the bare exception the guard
    // was added to eliminate — 9 digits always fits.
    require(args.length <= 2 || (args(2).matches("\\d+") && args(2).length <= 9),
      s"AnnStage: copies argument '${if (args.length > 2) args(2) else ""}' " +
        "is not a positive int (digits only, <= 9 digits)")
    val copies = if (args.length > 2) args(2).toInt else 100
    require(copies > 0, s"AnnStage: copies=$copies must be positive")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ScaleBench.validateStagedParams(out, s"copies=$copies;src=$src;tables=embeddings")
    if (!new java.io.File(s"$out/embeddings.parquet/_SUCCESS").exists())
      ScaleBench.stageEmbeddings(spark, src, out, copies)
    val n = spark.read.parquet(s"$out/embeddings.parquet").count()
    println(s"staged $out copies=$copies rows=$n")
    spark.stop()
  }
}
