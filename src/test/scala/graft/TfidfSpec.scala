package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Invariants tying the two TF-IDF formulations together: the relational
  * top-terms query (DuckDB-oracled) and the MLlib HashingTF/IDF pipeline
  * (rows-only — hash bucketing has no SQL analog). */
class TfidfSpec extends SparkSpec {

  test("relational tf-idf: a term in every doc scores exactly tf (idf == 1)") {
    val rows = TextAnalysis.tfidfTerms(spark, sf, topN = 1000).cache()
    try {
      val nDocs = Tables.load(spark, sf, "documents").count()
      // smoothed idf: ln((N+1)/(df+1)) + 1 == 1 exactly when df == N
      val ubiquitous = rows.filter(col("doc_freq") === nDocs)
      val bad = ubiquitous.filter(col("tfidf") =!= col("tf").cast("double")).count()
      assert(bad == 0, s"$bad ubiquitous terms with tfidf != tf")
      // rarer terms always outscore a same-tf ubiquitous term
      assert(rows.filter(col("tfidf") < col("tf").cast("double")).count() == 0,
        "idf must be >= 1 under the smoothed formulation")
    } finally rows.unpersist()
  }

  test("relational tf-idf: rank is dense 1..topN per doc and deterministic") {
    val r1 = TextAnalysis.tfidfTerms(spark, sf, topN = 5)
    val ranks = r1.groupBy("doc_id")
      .agg(collect_list("rnk").as("rs"), count(lit(1)).as("n")).collect()
    ranks.foreach { row =>
      val rs = row.getSeq[Int](1).sorted
      assert(rs == (1 to rs.size), s"ranks not dense: $rs")
      assert(rs.size <= 5)
    }
    val r2 = TextAnalysis.tfidfTerms(spark, sf, topN = 5)
    assert(r1.collect().toSet == r2.collect().toSet, "not deterministic")
  }

  test("MLlib tf-idf features: nnz bounded by distinct kept tokens, norms consistent") {
    val feats = TextAnalysis.tfidfFeatures(spark, sf).cache()
    try {
      assert(feats.count() ==
        Tables.load(spark, sf, "documents").count(), "one row per doc")
      // hashing can only merge tokens into buckets, never split them
      val stopArr = Seq("the", "a", "of", "and", "in", "to", "is",
        "der", "und", "le", "la", "el", "de", "et", "un")
        .map(s => s"'$s'").mkString(", ")
      val kept = Tables.load(spark, sf, "documents")
        .select(col("doc_id"),
          expr(s"size(array_distinct(filter(split(lower(text), '\\\\s+'), t -> NOT array_contains(array($stopArr), t))))")
            .as("n_kept"))
      val viol = feats.join(kept, "doc_id")
        .filter(col("nnz") > col("n_kept")).count()
      assert(viol == 0, s"$viol docs with nnz above distinct kept tokens")
      assert(feats.filter(col("nnz") > 0 && col("l2_norm") <= 0).count() == 0,
        "non-empty tfidf vector must have positive norm")
      assert(feats.filter(col("argmax_bucket") < 0
        || col("argmax_bucket") >= 1024).count() == 0, "argmax out of range")
    } finally feats.unpersist()
  }

  test("MLlib tf-idf features are deterministic") {
    val a = TextAnalysis.tfidfFeatures(spark, sf).collect().toSet
    val b = TextAnalysis.tfidfFeatures(spark, sf).collect().toSet
    assert(a == b)
  }
}
