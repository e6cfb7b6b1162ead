package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-7 training-pipeline operators (all three are
  * also DuckDB-oracled end-to-end; these pin the semantic properties the
  * hash compare can't express). */
class TrainingOpsSpec extends SparkSpec {

  test("repetition signals: fractions bounded, counts consistent") {
    val rows = graft.operators.TextAnalysis.repetitionSignals(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nTok = r.getAs[Int]("n_tokens")
      val nDist = r.getAs[Int]("n_distinct")
      val dupFrac = r.getAs[Double]("dup_token_frac")
      val topN = r.getAs[Long]("top_bigram_n")
      val topFrac = r.getAs[Double]("top_bigram_frac")
      assert(nDist >= 1 && nDist <= nTok)
      assert(dupFrac >= 0.0 && dupFrac < 1.0)
      assert(topN >= 1 && topN <= nTok - 1)
      assert(topFrac > 0.0 && topFrac <= 1.0)
    }
  }

  test("decontamination: only train docs flagged, ratios in (0,1]") {
    val evalSource = "src0"
    val docs = Tables.load(spark, sf, "documents")
    val trainIds = docs.filter(col("source") =!= evalSource)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val flagged = graft.operators.TextAnalysis.decontaminate(spark, sf).collect()
    assert(flagged.nonEmpty)
    flagged.foreach { r =>
      assert(trainIds.contains(r.getAs[Long]("doc_id")))
      val c = r.getAs[Double]("contamination")
      assert(c > 0.0 && c <= 1.0)
      assert(r.getAs[Long]("n_shared") <= r.getAs[Int]("n_shingles"))
    }
  }

  test("sequence packing: lanes partition the corpus, bins start at 0") {
    val packed = graft.operators.TextAnalysis.packSequences(spark, sf)
    val docs = Tables.load(spark, sf, "documents")
    val totalDocs = docs.count()
    val packedDocs = packed.agg(sum("n_docs")).collect()(0).getLong(0)
    assert(packedDocs == totalDocs, s"$packedDocs packed vs $totalDocs docs")
    val totalToks = docs
      .select(size(split(col("text"), " ")).as("n")).agg(sum("n"))
      .collect()(0).getLong(0)
    val packedToks = packed.agg(sum("n_tokens")).collect()(0).getLong(0)
    assert(packedToks == totalToks)
    // every lane's bins are contiguous from 0
    val lanes = packed.groupBy("lang", "shard")
      .agg(min("bin").as("lo"), max("bin").as("hi"), count(lit(1)).as("n"))
      .collect()
    lanes.foreach { r =>
      assert(r.getAs[Long]("lo") == 0L)
      assert(r.getAs[Long]("hi") == r.getAs[Long]("n") - 1)
    }
  }
}
