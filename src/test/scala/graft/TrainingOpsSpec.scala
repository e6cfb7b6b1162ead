package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-7 training-pipeline operators (all three are
  * also DuckDB-oracled end-to-end; these pin the semantic properties the
  * hash compare can't express). */
class TrainingOpsSpec extends SparkSpec {

  test("repetition signals: fractions bounded, counts consistent, short docs kept") {
    val rows = graft.operators.TextAnalysis.repetitionSignals(spark, sf).collect()
    assert(rows.nonEmpty)
    // the LEFT join's keep-all contract: every document appears, even
    // those under two tokens (an inner-join revert — the silent-drop bug
    // this pins — would shrink the output below the corpus count)
    val nDocs = Tables.load(spark, sf, "documents").count()
    assert(rows.length.toLong == nDocs,
      s"profile has ${rows.length} rows for $nDocs documents")
    rows.foreach { r =>
      val nTok = r.getAs[Int]("n_tokens")
      val nDist = r.getAs[Int]("n_distinct")
      val dupFrac = r.getAs[Double]("dup_token_frac")
      assert(nDist >= 1 && nDist <= nTok)
      assert(dupFrac >= 0.0 && dupFrac < 1.0)
      if (nTok >= 2) {
        // docs with a bigram carry real stats
        val topN = r.getAs[Long]("top_bigram_n")
        val topFrac = r.getAs[Double]("top_bigram_frac")
        assert(!r.isNullAt(r.fieldIndex("top_bigram_n")))
        assert(topN >= 1 && topN <= nTok - 1)
        assert(topFrac > 0.0 && topFrac <= 1.0)
      } else {
        // <2-token docs surface with honestly-NULL bigram columns —
        // getAs[Long] would unbox NULL to 0, so check nullity explicitly
        assert(r.isNullAt(r.fieldIndex("top_bigram_n")),
          s"short doc ${r.getAs[Long]("doc_id")} should have NULL bigram stats")
      }
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

  test("PMI recomputes from the displayed counts and totals") {
    import graft.operators.TextAnalysis
    // minCount 2 so the tiny spec corpus yields rows
    val rows = TextAnalysis.pmiCollocations(spark, sf, minCount = 2L).collect()
    assert(rows.nonEmpty)
    val toks = Tables.load(spark, sf, "documents")
      .select(split(col("text"), " ").as("t"))
    val nTokens = toks.select(sum(size(col("t")))).head.getLong(0)
    val nBigrams = toks.select(sum(greatest(size(col("t")) - 1, lit(0))))
      .head.getLong(0)
    rows.foreach { r =>
      val (nab, na, nb, pmi) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      val expect = math.log((nab.toDouble / nBigrams) /
        ((na.toDouble / nTokens) * (nb.toDouble / nTokens)))
      val rounded = BigDecimal(expect)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(pmi - rounded) <= 1e-9,
        s"${r.getString(0)} ${r.getString(1)}: $pmi vs $rounded")
    }
  }

  test("weighted sample: k per language, deterministic, keys ordered") {
    import graft.operators.TextAnalysis
    val k = 5
    val s1 = TextAnalysis.weightedSample(spark, sf, k).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val perLang = Tables.load(spark, sf, "documents")
      .groupBy("lang").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val byLang = s1.groupBy(_._1)
    assert(byLang.keySet == perLang.filter(_._2 > 0).keySet)
    byLang.foreach { case (lang, xs) =>
      assert(xs.length == math.min(k.toLong, perLang(lang)),
        s"$lang drew ${xs.length}")
      val sorted = xs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to xs.length).toSeq)
      // ranks follow the A-ES key (displayed rounded; allow equal at 6 dp)
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 <= b._4; case _ => true })
    }
    // the draw is a pure function of (doc_id, n_chars): partitioning-proof
    val s2 = TextAnalysis.weightedSample(spark, sf, k).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(s1.sortBy(x => (x._1, x._2)).toSeq == s2.sortBy(x => (x._1, x._2)).toSeq)
  }
}
