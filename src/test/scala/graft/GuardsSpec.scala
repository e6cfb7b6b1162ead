package graft

import org.apache.spark.sql.functions._
import graft.operators.{GlobalOrder, Similarity}

/** Pins for the loud-failure contracts added in round 14: each guard
  * exists because the silent behavior it replaced produced a
  * plausible-looking WRONG answer (truncated signatures, vanished
  * columns, NaN rankings) — these tests keep the guards loud. */
class GuardsSpec extends SparkSpec {
  import spark.implicits._

  test("withShardedGroupTopK rejects inputs carrying its scratch names") {
    val df = Seq((1L, "a", 2L)).toDF("k", "g", "_shard")
    val e = intercept[IllegalArgumentException] {
      GlobalOrder.withShardedGroupTopK(df, Seq("g"), col("k"), 1, "rk")(col("k"))
    }
    assert(e.getMessage.contains("_shard"))
    val df2 = Seq((1L, "a", 2L)).toDF("k", "g", "rk")
    val e2 = intercept[IllegalArgumentException] {
      GlobalOrder.withShardedGroupTopK(df2, Seq("g"), col("k"), 1, "rk")(col("k"))
    }
    assert(e2.getMessage.contains("rk"))
  }

  test("shingle_hash rejects n < 1 at construction") {
    val e = intercept[IllegalArgumentException] {
      graft.functions.HashExpressions.shingle_hash(col("t"), 0)
    }
    assert(e.getMessage.contains("n=0"))
  }

  test("minhash_sig enforces its Long-arithmetic contract at construction") {
    // p past the no-overflow bound (the Mersenne 2^61-1 is the natural
    // wrong choice — a*h+b wraps negative and biases every signature)
    intercept[IllegalArgumentException] {
      graft.functions.HashExpressions.minhash_sig(
        col("h"), Array(1L), Array(0L), (1L << 61) - 1)
    }
    // ragged coefficient arrays
    intercept[IllegalArgumentException] {
      graft.functions.HashExpressions.minhash_sig(
        col("h"), Array(1L, 2L), Array(0L), 2147483647L)
    }
    // coefficients outside [0, p)
    intercept[IllegalArgumentException] {
      graft.functions.HashExpressions.minhash_sig(
        col("h"), Array(-1L), Array(0L), 2147483647L)
    }
  }

  test("sign_bits errors on a vector/plane dimension mismatch") {
    val planes = Array(Array(1.0, 0.0, 0.0)) // 3-dim planes
    val df = Seq(Tuple1(Seq(1.0, 2.0))).toDF("v") // 2-dim vector
    val e = intercept[Exception] {
      df.select(graft.functions.HashExpressions.sign_bits(col("v"), planes, 64))
        .collect()
    }
    // the GUARD's message, not any incidental failure: a regressed guard
    // would AIOOBE with an unrelated message and must fail here
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("dims")),
      s"expected the sign_bits dimension guard, got: ${messages(e).mkString(" | ")}")
  }

  test("jaccard of two empty arrays is NULL, never NaN") {
    val df = Seq((Seq.empty[String], Seq.empty[String])).toDF("a", "b")
    val row = df.select(graft.functions.VecText.jaccard("a", "b").as("j")).head()
    assert(row.isNullAt(0),
      "empty/empty jaccard must be NULL — NaN orders above every double " +
        "and passes >= threshold filters as a bogus near-dup")
  }

  test("pointInInterval rejects decimal point/bound columns at the API") {
    val pts = Seq(Tuple1(BigDecimal(1.5))).toDF("p")
    val iv = Seq((0.0, 2.0)).toDF("lo", "hi")
    val e = intercept[IllegalArgumentException] {
      graft.plans.IntervalJoin.pointInInterval(pts, iv, "p", "lo", "hi")
    }
    assert(e.getMessage.contains("numeric"))
  }

  test("salted asof rejects inputs carrying its scratch names") {
    val l = Seq((1L, 1L, 5L)).toDF("k", "t", "__skey")
    val r = Seq((1L, 1L, 7L)).toDF("k2", "t2", "tb")
    val e = intercept[IllegalArgumentException] {
      graft.plans.AsOfJoin.asof(l, r, "k", "k2", "t", "t2", "tb", salt = 4)
    }
    assert(e.getMessage.contains("__skey"))
  }

  test("pqTopK rejects an nSub that does not divide the 64-dim embedding") {
    val e = intercept[IllegalArgumentException] {
      Similarity.pqTopK(spark, sf, nSub = 12)
    }
    assert(e.getMessage.contains("nSub=12"))
  }

  test("ScaleBench rejects a staged corpus missing its _PARAMS sentinel") {
    val base = java.nio.file.Files.createTempDirectory("guards_params").toString
    // (a) tables present, no sentinel → must fail (a pre-sentinel-era
    // leftover cannot be validated; stamping it with the CURRENT params
    // would validate nothing)
    val stale = new java.io.File(base, "stale"); stale.mkdirs()
    new java.io.File(stale, "documents.parquet").mkdirs()
    val e = intercept[IllegalArgumentException] {
      ScaleBench.validateStagedParams(stale.toString, "copies=10;src=x")
    }
    assert(e.getMessage.contains("_PARAMS"))
    // (b) fresh dir → sentinel written, second call with same params ok
    val fresh = new java.io.File(base, "fresh").toString
    ScaleBench.validateStagedParams(fresh, "copies=10;src=x")
    ScaleBench.validateStagedParams(fresh, "copies=10;src=x")
    // (c) params mismatch against the recorded sentinel → must fail
    val e2 = intercept[IllegalArgumentException] {
      ScaleBench.validateStagedParams(fresh, "copies=3;src=x")
    }
    assert(e2.getMessage.contains("copies=10"))
  }

  test("ScaleBench served-fraction gate: red above calibrated+allowance, green at the committed points") {
    // round-18 verdict ask #7: the artifact must turn RED, not record a
    // silently-higher number, when the served (id<10) probe fraction
    // diverges past the calibrated 0.098 target + 0.007 allowance
    ScaleBench.requireServedFraction("spec", 0.098) // the calibrated target
    ScaleBench.requireServedFraction("spec", 0.065) // the committed 5M point
    ScaleBench.requireServedFraction("spec", 0.105) // the allowance edge
    val e = intercept[IllegalArgumentException] {
      ScaleBench.requireServedFraction("spec", 0.106)
    }
    assert(e.getMessage.contains("0.106") && e.getMessage.contains("0.098"))
  }

  test("a thrown bench query lands in the errors field, never the timings") {
    val line = Bench.buildLine(
      Seq("q_ok" -> Some(1.25), "q_boom" -> None, "q_ok2" -> Some(0.5)),
      "/tmp/sfX")
    assert(line.contains(""""errors":["q_boom"]"""),
      s"missing errors field in: $line")
    assert(!line.contains(""""q_boom":"""),
      "a thrown query must not carry a timing — exception-unwinding " +
        s"wall time would read as a bogus speedup: $line")
    assert(line.contains(""""q_ok":1.250""") && line.contains(""""value":1.750"""))
    // the no-failure line must not carry an errors field at all
    assert(!Bench.buildLine(Seq("q_ok" -> Some(1.0)), "/tmp/sfX").contains("errors"))
  }

  test("bench line keeps headline fields last, inside the driver tail budget") {
    // The round-20 bench line failed the driver's stdout-tail parse and
    // cost an entire round its per-query prev/now table. The structural
    // defense (round-22 verdict item 2): the line is ONE line, the
    // headline fields start at ","sf": and run to the closing brace, and
    // that suffix — the only part that must survive the driver's ~2.1 KB
    // tail capture — stays far under the budget even with a worst-case
    // errors field; "value" is the final key so the total always lands.
    val many = (1 to 300).map(i => f"q_padding_name_$i%03d" -> Option(1.234))
    val errs = (1 to 20).map(i => f"q_failed_query_name_$i%03d" -> Option.empty[Double])
    val line = Bench.buildLine(many ++ errs, "/root/testdata/sf0.1")
    assert(!line.contains("\n") && line.endsWith("}"), "must be ONE line")
    val vIdx = line.lastIndexOf("\"value\":")
    assert(vIdx > 0 && !line.substring(vIdx).contains(","),
      s"value must be the LAST field: ...${line.substring(line.length - 60)}")
    val sfIdx = line.lastIndexOf(",\"sf\":")
    assert(sfIdx > 0, "headline block must exist")
    val suffix = line.substring(sfIdx)
    assert(suffix.length < 1600,
      s"headline suffix is ${suffix.length} B — it must stay well inside " +
        "the driver's ~2.1 KB stdout tail or the one-line contract breaks")
  }

  test("streamStatePartitions: key-derived with floor and session-width cap") {
    import graft.streaming.EventsStream
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    try {
      // small-corpus floor: a few thousand keys never drop below the
      // measured 4-store optimum
      spark.conf.set(key, "32")
      assert(EventsStream.streamStatePartitions(spark, 1L) == 4)
      assert(EventsStream.streamStatePartitions(spark, 15000L) == 4)
      // derived: 1e8 keys at 1e6 keys/store → 100, capped at session width
      assert(EventsStream.streamStatePartitions(spark, 100000000L) == 32)
      spark.conf.set(key, "2000")
      assert(EventsStream.streamStatePartitions(spark, 100000000L) == 100)
      // a session narrower than the floor never yields MORE than the
      // floor (and never zero/negative)
      spark.conf.set(key, "2")
      assert(EventsStream.streamStatePartitions(spark, 1L) == 4)
    } finally spark.conf.set(key, prev)
  }

  test("the range generator drains ALL rows under Trigger.Once") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    // rows >> batchRows: the ReadAllAvailable limit must jump to the end,
    // not admit one batch and terminate (90% of the data silently lost)
    val stream = spark.readStream.format("graft.sources.RangeGenSource")
      .option("rows", "1000").option("batchRows", "100").load()
    val name = s"guards_once_${System.nanoTime()}"
    val q = stream.groupBy().count()
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName(name)
      .trigger(Trigger.Once()).start()
    q.awaitTermination()
    val n = spark.table(name).head().getLong(0)
    spark.catalog.dropTempView(name)
    assert(n == 1000L, s"Trigger.Once drained $n of 1000 rows")
  }

  // ---- ANN5M skip-default carry protocol (round 20: the parser is the
  // ---- splice's only defense against carrying numbers measured on a
  // ---- DIFFERENT corpus — every refusal path gets a fixture)

  private def carryArtifact(
      src: String = "/root/testdata/sf0.1",
      seeds: String = "[1]",
      n: String = "5000000",
      scanned: String = "0.065",
      extra: String = ""): String =
    s"""{"metric":"ann5m","src":"$src","two_level_5m":{"n":$n,""" +
      s""""recall_at_5":0.980,"measured_scanned":$scanned,""" +
      s""""build_plus_serve_sec":6139.043,"pq_recall_at_5":0.980,""" +
      s""""pq_marginal_sec":38.539,"seeds":$seeds,$extra""" +
      s""""commit":"abc1234","measured_at_epoch_sec":1786892266}}"""

  test("carry parser accepts a valid singleton and negative-exponent numbers") {
    // 6.5E-2 == the 0.065 the emitter would write as %.3f — the r19
    // regex lacked '-' in its class and died on any negative exponent
    val d = ScaleBench.parseCarriedSingleton(
      carryArtifact(scanned = "6.5E-2"), 1L, 5000000L, "/root/testdata/sf0.1")
    assert(d.seed == 1L && d.rec == 0.98 && d.frac == 0.065 && d.from == "abc1234")
  }

  test("carry parser prefers the measured-commit marker over the splice's own") {
    val d = ScaleBench.parseCarriedSingleton(
      carryArtifact(extra = """"seed1_carried_from_commit":"33bce78","""),
      1L, 5000000L, "/root/testdata/sf0.1")
    assert(d.from == "33bce78",
      "a chained splice must keep naming the commit where the seed was MEASURED")
  }

  test("carry parser refuses a different source corpus (same n)") {
    // n5 = base × copies: a same-scale staging from another source
    // yields an IDENTICAL n, so src identity is the only tell
    val e = intercept[IllegalArgumentException] {
      ScaleBench.parseCarriedSingleton(
        carryArtifact(src = "/elsewhere/sf0.1"), 1L, 5000000L,
        "/root/testdata/sf0.1")
    }
    assert(e.getMessage.contains("src"))
  }

  test("carry parser refuses multi-seed, foreign-seed and size-mismatched artifacts") {
    val multi = intercept[IllegalArgumentException] {
      ScaleBench.parseCarriedSingleton(
        carryArtifact(seeds = "[1,2,3]"), 1L, 5000000L, "/root/testdata/sf0.1")
    }
    assert(multi.getMessage.contains("singleton"))
    val foreign = intercept[IllegalArgumentException] {
      ScaleBench.parseCarriedSingleton(
        carryArtifact(seeds = "[2]"), 1L, 5000000L, "/root/testdata/sf0.1")
    }
    assert(foreign.getMessage.contains("singleton"))
    val sized = intercept[IllegalArgumentException] {
      ScaleBench.parseCarriedSingleton(
        carryArtifact(), 1L, 4999999L, "/root/testdata/sf0.1")
    }
    assert(sized.getMessage.contains("4999999"))
  }

  test("two_level_5m extraction ignores a preceding recall_seeds block") {
    // the legacy full-sweep shape carries its own "seeds" array BEFORE
    // the field — the r19 whole-file regex matched that one
    val legacy =
      """{"metric":"scaleup_ratio","src":"/root/testdata/sf0.1",""" +
        """"recall_seeds":{"q_ann_ivf":{"seeds":[1,2,3]}},""" +
        carryArtifact().substring("""{"metric":"ann5m","src":"/root/testdata/sf0.1",""".length)
    val d = ScaleBench.parseCarriedSingleton(
      legacy, 1L, 5000000L, "/root/testdata/sf0.1")
    assert(d.seed == 1L)
  }

  test("validateStagedParams rewrites a legacy tables-suffixed sentinel in place") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sentinel").toString
    val pf = java.nio.file.Paths.get(dir, "_PARAMS")
    java.nio.file.Files.writeString(pf, "copies=30;src=/x;tables=events,orders")
    // same copies/src, tables dropped from the format: backfill, not restage
    ScaleBench.validateStagedParams(dir, "copies=30;src=/x")
    assert(java.nio.file.Files.readString(pf).trim == "copies=30;src=/x",
      "the sentinel must be rewritten to the new format")
    // and a REAL generation-parameter mismatch still fails loudly
    val e = intercept[IllegalArgumentException] {
      ScaleBench.validateStagedParams(dir, "copies=10;src=/x")
    }
    assert(e.getMessage.contains("copies=10"))
  }
}
