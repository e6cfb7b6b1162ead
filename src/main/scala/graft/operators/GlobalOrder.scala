package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed GLOBAL-ORDER machinery — rank/ntile/running-aggregate over
  * a total order WITHOUT a single-task window or global sort. Every
  * helper here plans the same two-pass shape:
  *
  *   1. `repartitionByRange` on the ordering (each partition holds a
  *      contiguous range of the total order),
  *   2. a PARTITIONED window computes the local rank / running value,
  *   3. per-partition partials (counts / sums / maxes — one tiny row per
  *      partition) are joined triangularly into prefix offsets and
  *      BROADCAST back,
  *   4. local + offset = the exact global value.
  *
  * The range exchange carries NO explicit partition count (round 21):
  * `repartitionByRange(cols…)` inherits the session parallelism and —
  * unlike an explicit `(32, cols…)` pin — stays AQE-coalescible, so the
  * post-shuffle partition count derives from the DATA (advisory
  * partition size) instead of a constant tuned for either local mode or
  * a cluster: a 46 MB local frame collapses to a couple of partitions
  * (the round-21 profile showed the fixed 32 paying ~32 near-empty
  * window/checkpoint tasks per pass), while a 100 TB frame fans out to
  * the session's full width. Correctness is partition-count-independent
  * (the offsets algebra below), which is exactly what lets AQE choose.
  *
  * The ranged frame is `localCheckpoint`'d before fan-out: its two
  * consumers (local window, partition partials) must observe the SAME
  * sampled range boundaries, and two independent executions of a range
  * exchange are not guaranteed identical cut points. Correctness is
  * boundary-independent anyway (the order is total, so a row's global
  * position doesn't depend on where ranges were cut) — the checkpoint
  * removes even the cosmetic risk, and it also stops the range
  * partitioner's sampling job from re-running lazy upstream aggregates
  * (measured 3-4× re-execution without it; see PLANS.md).
  *
  * At 100 TB this is the ONLY acceptable shape for global order: the
  * per-partition offset frame stays one row per partition however large
  * the data grows, while `Window.orderBy(...)` with no partition spec
  * funnels the whole frame through one task.
  *
  * Callers must supply a TOTAL order (break ties with the entity key):
  * with ties, local ranks near a range boundary would depend on the
  * sampled cut points.
  */
private[graft] object GlobalOrder {

  /** The standard NTILE(k) row partition (first n mod k tiles take
    * ⌈n/k⌉ rows, the rest ⌊n/k⌋ — identical in Spark and DuckDB) as a
    * SQL expression over a 1-based global position `i` and total `n`,
    * so callers that already hold distributed global positions can cut
    * tiles arithmetically instead of windowing. */
  def ntileExpr(iCol: String, nCol: String, k: Int): Column = expr(
    s"""CAST(CASE WHEN $iCol <= ($nCol % $k) * ($nCol div $k + 1)
       |     THEN ($iCol - 1) div ($nCol div $k + 1) + 1
       |     ELSE ($nCol % $k) +
       |          ($iCol - 1 - ($nCol % $k) * ($nCol div $k + 1))
       |            div GREATEST($nCol div $k, 1) + 1
       |     END AS INT)""".stripMargin)

  /** Distributed NTILE(k) for SEVERAL orderings through ONE exchange.
    * Each ordering is given as a monotone DECIMAL encoding (negate for
    * descending; the entity key breaks ties), the encodings are STACKED
    * into (metric, value, key) rows, and one range repartition + one
    * partitioned `row_number` + broadcast per-partition prefix offsets
    * rank every ordering at once; a keyed pivot returns one tile column
    * per ordering. Results match a global `ntile(k)` bit-for-bit.
    *
    * Why stacked: k independent two-pass cumsums each pay a range-
    * sampling job, an eager materialization and an offsets round —
    * measured as 3× the fixed cost for RFM's three orderings. Batching
    * the orderings through one exchange amortizes all of it.
    *
    * EXACTNESS PRECONDITION (ENFORCED, not just documented): encodings
    * are compared as DECIMAL(38,6) — six fractional digits. Integral and
    * ≤6-dp-decimal encodings (every current caller: day counts, order
    * counts, 2-dp money, doc ids) are preserved exactly; an encoding
    * with more fractional precision (a >6-scale decimal, or any
    * float/double) would be silently quantized, merging near-ties and
    * shifting tile boundaries relative to the true ordering — so such an
    * encoding is REJECTED at plan time. Pre-round such a metric to ≤6 dp
    * explicitly (making the tie its own, visible decision) before
    * passing it here. */
  /** Loud scratch-name guard shared by every helper here (previously
    * only the top-k helper had it, GuardsSpec-pinned): the scratch
    * columns are withColumn'd then dropped, so a caller frame already
    * carrying one of the names would have its column silently
    * overwritten and removed from the output. */
  private def requireFreshNames(
      df: DataFrame, names: Seq[String], helper: String): Unit =
    for (c <- names if df.columns.contains(c))
      throw new IllegalArgumentException(
        s"$helper: input already has a column named '$c' — rename it; " +
          "the helper owns that name")

  /** The triangular prefix-offset algebra every two-pass helper shares
    * (previously four hand-kept copies): per-partition partials
    * self-joined on strictly-preceding partition id (within the same
    * `keyCols` lane, if any), aggregated to one `_off` row per
    * partition. The partial frames are partition-cardinality (≤ 32 ×
    * lanes rows), so the triangular join is a constant-size driver-side
    * bargain however large the data. */
  private def prefixOffsets(partials: DataFrame, keyCols: Seq[String],
      valName: String, agg: Column => Column): DataFrame = {
    val b = partials.select(
      (keyCols.map(k => col(k).as(s"${k}_b")) :+
        col("_pid").as("_pid_b") :+ col(valName).as("_b")): _*)
    val cond = keyCols.map(k => col(s"${k}_b") === col(k))
      .foldLeft(col("_pid_b") < col("_pid"))(_ && _)
    partials.join(b, cond, "left")
      .groupBy(("_pid" +: keyCols).map(col): _*)
      .agg(agg(col("_b")).as("_off"))
  }

  def withStackedNtiles(df: DataFrame, keyCol: String, k: Int,
      specs: Seq[(String, Column)]): DataFrame = {
    require(k > 0, s"withStackedNtiles: k=$k must be positive — a " +
      "non-positive modulus would NULL every tile silently under " +
      "non-ANSI SQL")
    require(specs.nonEmpty, "withStackedNtiles: no orderings given")
    require(specs.map(_._1).distinct.size == specs.size &&
      !specs.map(_._1).contains(keyCol),
      "withStackedNtiles: ordering names must be distinct and differ " +
        s"from keyCol '$keyCol' — they become output columns")
    specs.foreach { case (n, enc) =>
      val dt = df.select(enc).schema.head.dataType
      val exact = dt match {
        // scale AND precision: DECIMAL(38,6) holds 32 integral digits, so
        // a wider-integral-part decimal (e.g. DECIMAL(38,0) ≥ 10^32)
        // would cast to NULL under non-ANSI mode, sort first, and land in
        // tile 1 regardless of its true ordering
        case d: DecimalType => d.scale <= 6 && d.precision - d.scale <= 32
        case org.apache.spark.sql.types.ByteType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.LongType => true
        case _ => false
      }
      require(exact,
        s"withStackedNtiles: ordering '$n' encodes as $dt, but comparisons " +
          "run at DECIMAL(38,6) — a finer encoding would be silently " +
          "quantized (merging near-ties) and a wider integral part would " +
          "overflow to NULL. Pre-round/cast the encoding to an integral or " +
          "<=6-scale, <=32-integral-digit decimal explicitly before calling.")
    }
    val prep = df.select(
      col(keyCol) +: specs.map { case (n, enc) =>
        enc.cast(DecimalType(38, 6)).as(s"_v_$n") }: _*)
    val stacked = prep.selectExpr(keyCol,
      "stack(" + specs.size + ", " +
        specs.map { case (n, _) => s"'$n', _v_$n" }.mkString(", ") +
      ") AS (_metric, _v)")
    val local = stacked
      .repartitionByRange(col("_metric"), col("_v"), col(keyCol))
      .withColumn("_pid", spark_partition_id())
      .withColumn("_lrn", row_number().over(
        Window.partitionBy("_pid", "_metric").orderBy(col("_v"), col(keyCol))))
      .localCheckpoint(true)
    val counts = local.groupBy("_pid", "_metric").agg(count(lit(1)).as("_cnt"))
    val totals = counts.groupBy("_metric").agg(sum("_cnt").as("_n"))
    val offs = prefixOffsets(counts, Seq("_metric"), "_cnt",
        b => coalesce(sum(b), lit(0L)))
      .join(totals, "_metric")
    val tiled = local.join(broadcast(offs), Seq("_pid", "_metric"))
      .withColumn("_i", col("_lrn") + col("_off"))
      .withColumn("_tile", ntileExpr("_i", "_n", k))
    val firstAgg +: restAgg = specs.map { case (n, _) =>
      max(when(col("_metric") === n, col("_tile"))).as(n) }
    tiled.groupBy(keyCol).agg(firstAgg, restAgg: _*)
  }

  /** Distributed global `row_number()` over a total order: range
    * repartition + partitioned local row_number + broadcast prefix
    * COUNTS. `outCol` is 1-based, bit-equal to
    * `row_number() OVER (ORDER BY order...)`. The vocabulary-rank /
    * distinct-value-rank workhorse: at 100 TB the ranked frame may hold
    * ~10⁸ rows, which a single-task window cannot. */
  def withGlobalRowNumber(df: DataFrame, outCol: String, order: Column*): DataFrame = {
    requireFreshNames(df, Seq("_pid", "_lrn", "_off", outCol),
      "withGlobalRowNumber")
    val local = df.repartitionByRange(order: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_lrn", row_number().over(
        Window.partitionBy("_pid").orderBy(order: _*)))
      .localCheckpoint(true)
    val counts = local.groupBy("_pid").agg(count(lit(1)).as("_cnt"))
    val offs = prefixOffsets(counts, Nil, "_cnt",
      b => coalesce(sum(b), lit(0L)))
    local.join(broadcast(offs), "_pid")
      .withColumn(outCol, col("_lrn") + col("_off"))
      .drop("_pid", "_lrn", "_off")
  }

  /** Distributed global `row_number()` for SEVERAL stacked orderings
    * through ONE range exchange (round 22): input rows carry a metric
    * discriminator in `metricCol`; within each metric value the `order`
    * columns must be a total order. `outCol` is the 1-based rank WITHIN
    * the row's metric — bit-equal to running [[withGlobalRowNumber]]
    * once per metric, but paying one range-sampling job, one eager
    * checkpoint and one offsets round instead of one of each per metric
    * (the [[withStackedNtiles]] amortization, without the tiling). The
    * range exchange keys on (metric, order...), so each partition holds
    * a contiguous slice of one or more metrics and the per-(pid, metric)
    * prefix offsets recover exact global positions. */
  def withStackedGlobalRowNumber(df: DataFrame, metricCol: String,
      outCol: String, order: Column*): DataFrame = {
    requireFreshNames(df, Seq("_pid", "_lrn", "_off", outCol),
      "withStackedGlobalRowNumber")
    val local = df.repartitionByRange(col(metricCol) +: order: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_lrn", row_number().over(
        Window.partitionBy(col("_pid"), col(metricCol)).orderBy(order: _*)))
      .localCheckpoint(true)
    val counts = local.groupBy(col("_pid"), col(metricCol))
      .agg(count(lit(1)).as("_cnt"))
    val offs = prefixOffsets(counts, Seq(metricCol), "_cnt",
      b => coalesce(sum(b), lit(0L)))
    local.join(broadcast(offs), Seq("_pid", metricCol))
      .withColumn(outCol, col("_lrn") + col("_off"))
      .drop("_pid", "_lrn", "_off")
  }

  /** Distributed running sum over a total order: per-partition local
    * running sums + broadcast prefix offsets from per-partition partials
    * (same triangular-join shape as [[withGlobalRowNumber]]'s counts).
    * DECIMAL partials keep the two-pass total bit-equal to a global
    * `sum() OVER (ROWS UNBOUNDED PRECEDING)`. */
  def withDistributedRunningSum(
      df: DataFrame, valCol: Column, outCol: String, order: Column*): DataFrame = {
    requireFreshNames(df, Seq("_pid", "_v", "_lsum", "_off", outCol),
      "withDistributedRunningSum")
    val pw = Window.partitionBy("_pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = df.repartitionByRange(order: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_v", valCol)
      .withColumn("_lsum", sum("_v").over(pw))
      .localCheckpoint(true)
    val partials = local.groupBy("_pid").agg(sum("_v").as("_psum"))
    val offs = prefixOffsets(partials, Nil, "_psum", b => sum(b))
    local.join(broadcast(offs), "_pid")
      .withColumn(outCol,
        when(col("_off").isNull, col("_lsum"))
          .otherwise(col("_lsum") + col("_off")))
      .drop("_pid", "_v", "_lsum", "_off")
  }

  /** TWO-PHASE sharded per-group top-k — exact `row_number() <= k`
    * within each group of a possibly-UNBOUNDED group (a language's
    * vocabulary, a viral domain) without ever sorting a whole group in
    * one window lane. Phase 1 ranks inside (group, hash-of-`shardKey`
    * sub-shard) lanes — each holds ~|group|/shards rows however hot the
    * group — and keeps the local top-k; phase 2 ranks the survivors (≤
    * shards×k rows per group BY CONSTRUCTION: a bounded merge of
    * per-shard heads). Exact because any row in a group's global top-k
    * has at most k−1 rows ahead of it overall, hence at most k−1 ahead
    * in its own shard — it always survives phase 1, along with
    * everything ranked above it, so phase-2 ranks equal global ranks.
    * `order` must be a total order within each group (break ties with
    * the entity key) and `rankCol` is the 1-based global group rank. */
  def withShardedGroupTopK(df: DataFrame, groupCols: Seq[String],
      shardKey: Column, k: Int, rankCol: String, shards: Int = 32)(
      order: Column*): DataFrame = {
    require(k > 0, s"withShardedGroupTopK: k=$k must be positive")
    require(shards > 0, s"withShardedGroupTopK: shards=$shards must be " +
      "positive — a non-positive modulus would null the shard column and " +
      "silently collapse phase 1 into the unbounded single-lane shape")
    requireFreshNames(df, Seq("_shard", "_lrk", rankCol),
      "withShardedGroupTopK")
    val lane = Window
      .partitionBy(groupCols.map(col) :+ col("_shard"): _*).orderBy(order: _*)
    val merge = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn("_shard", pmod(xxhash64(shardKey), lit(shards)))
      .withColumn("_lrk", row_number().over(lane))
      .filter(col("_lrk") <= k)
      .drop("_shard", "_lrk")
      .withColumn(rankCol, row_number().over(merge))
      .filter(col(rankCol) <= k)
  }

  /** Distributed STRICT-PREFIX running max (`max() OVER (ORDER BY ...
    * ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)`): the
    * frontier-scan shape. Local prev-row running max per range
    * partition; the offset is the plain max of every PRECEDING
    * partition's total max (all of a preceding partition's rows precede
    * every local row, so the strict-prefix distinction only matters
    * inside the local window). `greatest` skips nulls, so a partition's
    * first row (null local prev-max) inherits the offset alone, and the
    * global first row stays null — bit-equal to the single-task
    * window's frame. */
  def withDistributedRunningMaxPrev(
      df: DataFrame, valCol: Column, outCol: String, order: Column*): DataFrame = {
    requireFreshNames(df, Seq("_pid", "_v", "_lmax", "_off", outCol),
      "withDistributedRunningMaxPrev")
    val pw = Window.partitionBy("_pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = df.repartitionByRange(order: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_v", valCol)
      .withColumn("_lmax", max("_v").over(pw))
      .localCheckpoint(true)
    val partials = local.groupBy("_pid").agg(max("_v").as("_pmax"))
    val offs = prefixOffsets(partials, Nil, "_pmax", b => max(b))
    local.join(broadcast(offs), "_pid")
      .withColumn(outCol, greatest(col("_lmax"), col("_off")))
      .drop("_pid", "_v", "_lmax", "_off")
  }
}
