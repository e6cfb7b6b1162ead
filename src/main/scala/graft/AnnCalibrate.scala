package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession

/** ANN geometry CALIBRATION harness — the measurement behind the
  * round-15 search-geometry rules ([[Similarity.autoSearchNlist]]/autoNprobe /
  * autoRerank): sweeps (nlist, nprobe) for IVF and (nCodes, rerank,
  * geometry) for IVFADC-PQ over a corpus dir and prints recall@5
  * against the exact brute-force top-k NEXT TO the measured scanned
  * fraction — the pair of numbers the auto rules must trade off. Run
  * at several corpus sizes (sf0.01 / sf0.1 / the staged 10× corpus) to
  * see how the recall-at-fraction curve moves with n.
  *
  * Usage: runMain graft.AnnCalibrate <dir> [ivf|tune|auto]
  *   ivf  — (nlist, nprobe) grid at the default training fraction
  *   tune — pinned high-granularity sweep (training fraction / iters)
  *   auto — validate the shipped auto rules + PQ (nCodes, rerank) sweep
  */
object AnnCalibrate {
  private val Modes = Set("ivf", "tune", "auto", "pq", "two")
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val mode = if (args.length > 1) args(1) else "auto"
    require(Modes.contains(mode),
      s"unknown mode '$mode' — expected one of ${Modes.mkString("|")}")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val brute = Similarity.bruteTopK(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    println(s"corpus=$dir n=$n brute_pairs=${brute.size}")

    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (brute & got).size.toDouble / brute.size
    }
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    // nlist ladder spanning the auto rule and above it; nprobe values
    // chosen to sweep scanned fractions ~3%..40%
    val nlists: Seq[Int] =
      if (n <= 600) Seq(32, 64, 128)
      else if (n <= 3000) Seq(128, 256, 512)
      else if (n <= 30000) Seq(1024, 2048, 4096, 8192)
      else Seq(8192, 16384, 32768)

    if (mode == "ivf") {
      println("== IVF (nlist, nprobe) -> recall@5, scanned_fraction, sec ==")
      for (nl <- nlists) {
        val nps = Seq(nl / 16, 3 * nl / 40, nl * 3 / 32, nl / 10, nl / 8)
          .map(p => math.max(2, p)).distinct.sorted
        for (np <- nps) {
          val t0 = System.nanoTime()
          val rec = recallOf(Similarity.ivfTopK(spark, dir, 5, 10, nlist = nl, nprobe = np))
          val sec = (System.nanoTime() - t0) / 1e9
          val frac = Similarity.ivfScannedFraction(spark, dir, 10, nl, np)
          println(s"IVF nlist=$nl nprobe=$np recall=${f3(rec)} frac=${f3(frac)} sec=${f3(sec)}")
        }
      }
    }

    if (mode == "tune") {
      println("== IVF train-quality sweep (nlist, nprobe, trainFrac, iters) ==")
      for ((nl, np, tf, it) <- Seq(
        (16384, 983, 1.0, 5), (16384, 983, 1.0, 10), (16384, 983, 1.0, 15),
        (8192, 492, 1.0, 10), (16384, 1229, 1.0, 10))) {
        val t0 = System.nanoTime()
        val rec = recallOf(Similarity.ivfTopK(spark, dir, 5, 10,
          nlist = nl, nprobe = np, trainFraction = tf, trainIters = it))
        val sec = (System.nanoTime() - t0) / 1e9
        val frac = Similarity.ivfScannedFraction(spark, dir, 10, nl, np, tf, it)
        println(s"IVF nlist=$nl nprobe=$np tf=$tf iters=$it " +
          s"recall=${f3(rec)} frac=${f3(frac)} sec=${f3(sec)}")
      }
    }

    if (mode == "pq") {
      println("== PQ (nSub, nCodes, rerank) sweep at auto coarse geometry ==")
      for (ns <- Seq(8, 16); rr <- Seq(256, 512, 1024, 2048)) {
        val t1 = System.nanoTime()
        val rec = recallOf(Similarity.pqTopK(spark, dir, 5, 10,
          nSub = ns, nCodes = 256, rerank = rr))
        val sec = (System.nanoTime() - t1) / 1e9
        println(s"PQ nSub=$ns nCodes=256 rerank=$rr recall=${f3(rec)} sec=${f3(sec)}")
      }
    }

    if (mode == "two") {
      // the two-level residual route on a REAL corpus past the cap-bind
      // point (round-17 verdict ask #1): ivfTopK auto-routes there when
      // autoSearchCells says the single-level cap binds, so this mode
      // validates the exact dispatch a user's default call takes. The
      // measured pair mirrors the single-level auto mode: recall@5 vs
      // brute force + the MEASURED scanned fraction of the selected
      // cells (not the modeled count ratio).
      println("== TWO-LEVEL auto route: recall@5 + measured scanned fraction ==")
      val (l1, l2) = Similarity.autoSearchCells(n)
      require(l2 > 1, s"corpus n=$n is below the cap-bind point — " +
        "the auto route would serve single-level; stage a larger corpus")
      val t0 = System.nanoTime()
      val rec = recallOf(Similarity.ivfTopK(spark, dir, 5, 10))
      val sec = (System.nanoTime() - t0) / 1e9
      val frac = Similarity.ivf2ScannedFraction(spark, dir, 10)
      println(s"TWO l1=$l1 l2=$l2 recall=${f3(rec)} frac=${f3(frac)} sec=${f3(sec)}")
    }

    if (mode == "auto") {
      println("== AUTO geometry: IVF + PQ(nCodes, rerank sweep) ==")
      val t0 = System.nanoTime()
      val ivfRec = recallOf(Similarity.ivfTopK(spark, dir, 5, 10))
      val ivfSec = (System.nanoTime() - t0) / 1e9
      val frac = Similarity.ivfScannedFraction(spark, dir, 10)
      println(s"IVF auto recall=${f3(ivfRec)} frac=${f3(frac)} sec=${f3(ivfSec)}")
      // nSub = 0: the SHIPPED default (auto subDim ≈ 4) — this mode
      // validates the defaults the registered queries actually serve
      for (nc <- Seq(32, 256); rr <- Seq(64, 128, 256, 512, 1024)) {
        val t1 = System.nanoTime()
        val rec = recallOf(Similarity.pqTopK(spark, dir, 5, 10,
          nSub = 0, nCodes = nc, rerank = rr))
        val sec = (System.nanoTime() - t1) / 1e9
        println(s"PQ auto nSub=auto nCodes=$nc rerank=$rr recall=${f3(rec)} " +
          s"frac=${f3(frac)} sec=${f3(sec)}")
      }
    }
    spark.stop()
  }
}
