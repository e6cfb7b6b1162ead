package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage a 96-DIM variant of a testdata dir — the round-16 ask: the
  * embedding-dim contract was generalized in round 15 (dim derived from
  * data, 24-dim spec-covered) but no ORACLED query had ever executed on
  * non-64-dim data. `runMain graft.StageDim96 <src> <out>` copies every
  * table verbatim except `embeddings`, whose vectors widen 64 → 96 by
  * appending a deterministic transform of their own first 32 dims
  * (−x/2, float-exact): zero vectors stay zero (the shared zero-norm
  * semantics keep holding), ids/labels are untouched, and the widened
  * table is MATERIALIZED so the DuckDB oracles recompute from the same
  * 96-dim parquet the engine reads — any 64-dim assumption that
  * survived the round-15 generalization surfaces as a hash break when
  * Verify + check_oracle run against this dir. */
object StageDim96 {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "/tmp/graft_dim96"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents")
    for (t <- tables)
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    val emb = spark.read.schema(Tables.embeddings).parquet(s"$src/embeddings.parquet")
      .withColumn("embedding",
        expr("concat(embedding, transform(slice(embedding, 1, 32), " +
          "x -> CAST(-x * 0.5 AS FLOAT)))"))
    emb.write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    val d = spark.read.parquet(s"$out/embeddings.parquet")
      .select(size(col("embedding")).as("d")).head().getInt(0)
    println(s"staged $out embedding_dim=$d")
    spark.stop()
  }
}
