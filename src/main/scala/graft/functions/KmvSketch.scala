package graft.functions

import com.esotericsoftware.kryo.{Kryo, KryoSerializable}
import com.esotericsoftware.kryo.io.{Input, Output}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** K-MINIMUM-VALUES (KMV / "theta") distinct-value sketch — the
  * mergeable-sketch family's SET-OPERATIONS member, complementing the
  * HLL rollup (union-only estimates) and CMS (frequencies) in
  * [[graft.operators.Sketches]]: keeping the k smallest distinct 64-bit
  * hash values of a set supports not just cardinality and union but
  * INTERSECTION and difference estimates (Beyer et al., "On synopses
  * for distinct-value estimation under multiset operations", SIGMOD
  * 2007 — the algorithm behind theta sketches), which no HLL variant
  * can deliver without inclusion-exclusion error blow-up.
  *
  * Estimator (hashes mapped monotonically to u ∈ (0,1)): with U(k) the
  * k-th smallest u, |S| ≈ (k-1)/U(k); a sketch holding fewer than k
  * values contains its WHOLE set, so the count is exact. Standard error
  * ~ 1/√(k-2): k=1024 ⇒ ~3%.
  *
  * Scale shape — the reason this is an [[Aggregator]] rather than a
  * window or a distinct: partial aggregation applies it MAP-SIDE, so a
  * per-group distinct-set question shuffles one ≤k-long buffer per
  * (group × map partition) instead of the deduplicated value stream
  * itself. Duplicates collapse inside the buffer (k smallest DISTINCT),
  * so no upstream `distinct()` — and therefore no value-grain shuffle —
  * is needed at any corpus size.
  *
  * Result determinism: the k smallest distinct values of a set do not
  * depend on arrival order or partitioning, and the threshold prune
  * never discards a value that could re-enter (anything ≥ the current
  * k-th smallest distinct of THIS buffer is dominated by k smaller
  * values that are themselves in the buffer) — so results are
  * bit-identical under any combine order, the property every custom
  * aggregate must have on a 1000-executor job.
  */
object KmvSketch {

  /** Mutable bounded buffer: up to 4k appended (possibly duplicate)
    * hash values; compaction sorts, dedupes and truncates to the k
    * smallest distinct. `thr` is the k-th smallest distinct seen so far
    * once saturated (Long.MaxValue before) — the steady-state O(1)
    * reject threshold. Kryo serialization (shuffle/spill of partial
    * aggregates) COMPACTS first and writes only the ≤k live values, so
    * the exchanged bytes match the sketch size, not the 4k scratch
    * capacity. */
  final class KmvBuf(var vs: Array[Long], var n: Int,
      var thr: Long, var sat: Boolean, var k: Int) extends KryoSerializable {
    def this() = this(null, 0, Long.MaxValue, false, 0) // kryo re-create

    override def write(kryo: Kryo, out: Output): Unit = {
      KmvSketch.compact(this)
      out.writeInt(k)
      out.writeBoolean(sat)
      out.writeLong(thr)
      out.writeInt(n)
      var i = 0
      while (i < n) { out.writeLong(vs(i)); i += 1 }
    }

    override def read(kryo: Kryo, in: Input): Unit = {
      k = in.readInt()
      sat = in.readBoolean()
      thr = in.readLong()
      n = in.readInt()
      vs = new Array[Long](4 * k)
      var i = 0
      while (i < n) { vs(i) = in.readLong(); i += 1 }
    }
  }

  /** Product-encoded result wrapper: `mins` is the ascending array of
    * the ≤k smallest distinct signed-64 hash values (signed order ==
    * normalized-u order, since u(v) = v/2⁶⁴ + 0.5 is affine). */
  final case class KmvResult(mins: Array[Long])

  // Sort + dedupe the used prefix in place, keep the k smallest
  // distinct. Amortized cost: one O(cap log cap) sort per ~3k inserts.
  private def compact(b: KmvBuf): Unit = {
    val a = java.util.Arrays.copyOfRange(b.vs, 0, b.n)
    java.util.Arrays.sort(a)
    var w = 0
    var i = 0
    while (i < a.length && w < b.k) {
      if (w == 0 || a(i) != a(w - 1)) { a(w) = a(i); w += 1 }
      i += 1
    }
    System.arraycopy(a, 0, b.vs, 0, w)
    b.n = w
    if (w == b.k) { b.thr = b.vs(b.k - 1); b.sat = true }
  }

  final class KmvMinValues(k: Int) extends Aggregator[Long, KmvBuf, KmvResult] {
    require(k >= 16 && k <= 65536, s"KMV k out of range: $k")
    private val cap = 4 * k

    override def zero: KmvBuf =
      new KmvBuf(new Array[Long](cap), 0, Long.MaxValue, false, k)

    override def reduce(b: KmvBuf, h: Long): KmvBuf = {
      // ≥ thr (saturated): h is a duplicate of the retained k-th value
      // or dominated by k smaller retained values — safe to drop.
      if (!(b.sat && h >= b.thr)) {
        if (b.n == cap) compact(b) // leaves n ≤ k < cap
        b.vs(b.n) = h
        b.n += 1
      }
      b
    }

    override def merge(x: KmvBuf, y: KmvBuf): KmvBuf = {
      var i = 0
      while (i < y.n) { reduce(x, y.vs(i)); i += 1 }
      x
    }

    override def finish(b: KmvBuf): KmvResult = {
      compact(b)
      KmvResult(java.util.Arrays.copyOfRange(b.vs, 0, b.n))
    }

    override def bufferEncoder: Encoder[KmvBuf] = Encoders.kryo[KmvBuf]
    override def outputEncoder: Encoder[KmvResult] = Encoders.product[KmvResult]
  }
}
