package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the sketching hot loops.
  *
  * The SQL-combinator formulation (`transform` + `aggregate` higher-order
  * functions) evaluates one interpreted lambda call per (element × perm) —
  * ~128·|shingles| closures per row for MinHash. These expressions run the
  * same arithmetic as a tight JVM loop inside whole-stage codegen
  * (`doGenCode`), preference order (b) of the build rules: a custom
  * `Expression` before any custom operator, and never a Scala UDF.
  *
  * Both are pure functions of their input array — partitioning- and
  * order-independent, so results are identical to the combinator versions
  * they replace (pinned by DedupSpec / the t2 oracle).
  */
object HashExpressions {

  /** Loud rejection of null ELEMENTS. checkInputDataTypes accepts
    * containsNull arrays (producers usually emit containsNull=false of
    * the same type), but the tight loops below would otherwise NPE deep
    * in XXH64 on a null string or silently read a null numeric element
    * as 0 — both worse than an actionable error. One branch per
    * element. */
  private def rejectNullElement(arr: ArrayData, i: Int, fn: String): Unit =
    if (arr.isNullAt(i))
      throw new IllegalArgumentException(
        s"$fn: null element at index $i - filter nulls from the input array first")

  /** Distinct hashed word-n-grams of a token-array column, in one tight
    * loop: per-token xxhash64, then a mixed rolling combine of n
    * consecutive token hashes, deduplicated preserving first occurrence.
    * Replaces `array_distinct(transform(sequence(...), i -> concat_ws(...)))`
    * + a second hashing pass — the interpreted-lambda hot spot of both
    * dedup paths. 64-bit space ⇒ cross-shingle collision odds ~1e-10 at
    * 10^5 distinct shingles per corpus block. */
  case class ShingleHash(child: Expression, n: Int)
      extends UnaryExpression {
    // n <= 0 would pass the len < n early-exit and read past the token
    // array (i <= len - n with n = 0 reads tok(len)) — reject at plan
    // construction, not as an AIOOBE mid-task
    require(n >= 1, s"shingle_hash: n=$n must be >= 1")

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"shingle_hash needs array<string>, got ${other.catalogString}")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "shingle_hash"

    def compute(arr: ArrayData): ArrayData = {
      val len = arr.numElements()
      if (len < n) return new GenericArrayData(Array.emptyLongArray)
      val tok = new Array[Long](len)
      var i = 0
      while (i < len) {
        rejectNullElement(arr, i, "shingle_hash")
        val s = arr.getUTF8String(i)
        tok(i) = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        i += 1
      }
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      i = 0
      while (i <= len - n) {
        var h = tok(i)
        var j = 1
        while (j < n) {
          h = java.lang.Long.rotateLeft(h, 27) * -7046029254386353131L + tok(i + j)
          j += 1
        }
        seen.add(h)
        i += 1
      }
      val out = new Array[Long](seen.size())
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new GenericArrayData(out)
    }

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("shingleSelf", this, classOf[ShingleHash].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
    }

    override protected def withNewChildInternal(newChild: Expression): ShingleHash =
      copy(child = newChild)
  }

  /** MinHash signature: for each permutation j, min_i((a_j·h_i + b_j) mod p)
    * over the input hash array (h_i reduced into [0, p) internally).
    * Empty input → p per slot. */
  case class MinHashSig(child: Expression, a: Array[Long], b: Array[Long], p: Long)
      extends UnaryExpression {
    // the a·h+b arithmetic stays in Long only if p² + p < 2^63 (h and the
    // coefficients live in [0,p)): a larger p (e.g. the Mersenne 2^61-1)
    // silently wraps negative and biases every signature; enforce the
    // whole contract here instead of documenting it at one call site
    require(p > 0 && p <= 3037000499L,
      s"minhash_sig: p=$p must be in (0, 3037000499] so a*h+b stays in Long")
    require(a.length == b.length,
      s"minhash_sig: coefficient arrays differ: ${a.length} vs ${b.length}")
    // a_j = 0 is DEGENERATE, not just out-of-convention: slot j becomes
    // the constant b_j for every non-empty input, so all documents agree
    // on it — estimated Jaccard silently inflates by 1/nPerm per zero
    // coefficient and LSH bands over-admit. Universal hashing needs
    // a ∈ [1, p) (Dedup.permA already draws 1 + |r| % (p-1)); enforce the
    // real contract here rather than only at that call site.
    require(a.forall(x => x >= 1 && x < p),
      "minhash_sig: multipliers a must lie in [1, p) - a = 0 makes that " +
        "permutation constant and biases every Jaccard estimate")
    require(b.forall(x => x >= 0 && x < p),
      "minhash_sig: offsets b must lie in [0, p)")

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig needs array<bigint>, got ${other.catalogString}")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "minhash_sig"

    def compute(arr: ArrayData): Array[Long] = {
      val nPerm = a.length
      val sig = new Array[Long](nPerm)
      java.util.Arrays.fill(sig, p)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        rejectNullElement(arr, i, "minhash_sig")
        val h = java.lang.Math.floorMod(arr.getLong(i), p) // into [0,p): a*h stays in Long
        var j = 0
        while (j < nPerm) {
          val v = (a(j) * h + b(j)) % p
          if (v < sig(j)) sig(j) = v
          j += 1
        }
        i += 1
      }
      sig
    }

    override def nullSafeEval(input: Any): Any =
      new GenericArrayData(compute(input.asInstanceOf[ArrayData]))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("minhashSelf", this, classOf[MinHashSig].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($self.compute($c));")
    }

    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
  }

  /** 64-bit SimHash: bit k of the output is set iff more than half of the
    * input hashes have bit k set (majority vote over token hashes). */
  case class SimHash64(child: Expression)
      extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash64 needs array<bigint>, got ${other.catalogString}")
    }
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "simhash64"

    def compute(arr: ArrayData): Long = {
      val counts = new Array[Int](64)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        rejectNullElement(arr, i, "simhash64")
        val h = arr.getLong(i)
        var k = 0
        while (k < 64) {
          if (((h >>> k) & 1L) == 1L) counts(k) += 1
          k += 1
        }
        i += 1
      }
      var out = 0L
      var k = 0
      while (k < 64) {
        if (counts(k) * 2 > n) out |= (1L << k)
        k += 1
      }
      out
    }

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("simhashSelf", this, classOf[SimHash64].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
    }

    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  /** Sequential-fold dot product of two numeric arrays (float or double
    * elements), promoted to double per element — bit-identical to
    * `aggregate(zip_with(a, b, (x,y) -> CAST(x AS DOUBLE)*CAST(y AS DOUBLE)),
    * 0D, (acc,v) -> acc+v)` and to DuckDB's `list_dot_product`, but a tight
    * codegen'd loop instead of 2·n interpreted lambda calls. Ragged
    * inputs ERROR (where the zip_with form null-pads to NULL): a length
    * mismatch between embedding vectors is a data bug, not a similarity
    * of the shorter prefix. */
  case class DotProduct(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

    private def elemOk(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    override def checkInputDataTypes(): TypeCheckResult =
      if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"dot_product needs array<float|double>, got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "dot_product"

    @transient private lazy val leftIsFloat =
      left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    @transient private lazy val rightIsFloat =
      right.dataType.asInstanceOf[ArrayType].elementType == FloatType

    def compute(l: ArrayData, r: ArrayData): Double = {
      // ragged inputs are a data bug: silently truncating to the shorter
      // array returns a plausible-looking wrong similarity (and diverges
      // from the zip_with formulation, which null-pads to NULL)
      if (l.numElements() != r.numElements())
        throw new IllegalArgumentException(
          s"dot_product: length mismatch ${l.numElements()} vs ${r.numElements()}")
      val n = l.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) {
        rejectNullElement(l, i, "dot_product")
        rejectNullElement(r, i, "dot_product")
        val x = if (leftIsFloat) l.getFloat(i).toDouble else l.getDouble(i)
        val y = if (rightIsFloat) r.getFloat(i).toDouble else r.getDouble(i)
        acc += x * y
        i += 1
      }
      acc
    }

    override def nullSafeEval(l: Any, r: Any): Any =
      compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("dotSelf", this, classOf[DotProduct].getName)
      nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $self.compute($l, $r);")
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  /** Random-hyperplane sign signature: bit j of the output is 1 iff
    * `planes(j) · v >= 0`. The planes ride INSIDE the expression object
    * (like [[MinHashSig]]'s coefficients) rather than as literal arrays in
    * the plan — nBits×dim literal expressions would dominate analysis /
    * codegen time and dwarf the actual per-row work. Output is one packed
    * Long per `bitsPerWord` bits (wordy enough for 64-bit bands), so the
    * downstream band join keys on scalar longs, not arrays. */
  case class SignBits(child: Expression, planes: Array[Array[Double]], bitsPerWord: Int)
      extends UnaryExpression {
    require(bitsPerWord > 0 && bitsPerWord <= 64)
    // ragged PLANES are the constructor-side twin of the per-row
    // dimension check in compute: a shorter row would AIOOBE mid-task,
    // a longer one would silently sign a truncated projection — the
    // exact recall degradation the per-row check exists to forbid.
    // Validate once at plan construction, like MinHashSig's coefficients.
    require(planes.isEmpty || planes.forall(_.length == planes(0).length),
      s"sign_bits: ragged hyperplane rows (lengths ${planes.map(_.length).distinct.mkString(",")}) - " +
        "every plane must have the vector dimension")

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sign_bits needs array<float|double>, got ${other.catalogString}")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "sign_bits"

    @transient private lazy val childIsFloat =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType

    def compute(arr: ArrayData): Array[Long] = {
      val nBits = planes.length
      val nWords = (nBits + bitsPerWord - 1) / bitsPerWord
      val out = new Array[Long](nWords)
      // a vector/plane dimension mismatch is a data bug, not a signature
      // of the common prefix — signing a truncated projection silently
      // degrades candidate recall with no error anywhere downstream
      // (same contract as DotProduct's ragged-input rejection)
      val dim = if (nBits > 0) planes(0).length else 0
      if (nBits > 0 && arr.numElements() != dim)
        throw new IllegalArgumentException(
          s"sign_bits: vector has ${arr.numElements()} dims but planes expect $dim")
      // decode the vector ONCE into a primitive array (round-17 review):
      // the old per-plane re-decode paid nBits×dim ArrayData accessor
      // calls plus a float/double branch per element — ~196k decodes per
      // row at 256 bits × 768 dims where dim suffices; the inner loop is
      // now pure primitive-array arithmetic
      val x = new Array[Double](dim)
      var v = 0
      while (v < dim) {
        rejectNullElement(arr, v, "sign_bits")
        x(v) = if (childIsFloat) arr.getFloat(v).toDouble else arr.getDouble(v)
        v += 1
      }
      var j = 0
      while (j < nBits) {
        val p = planes(j)
        var acc = 0.0
        var i = 0
        while (i < dim) {
          acc += x(i) * p(i)
          i += 1
        }
        if (acc >= 0) out(j / bitsPerWord) |= (1L << (j % bitsPerWord))
        j += 1
      }
      out
    }

    override def nullSafeEval(input: Any): Any =
      new GenericArrayData(compute(input.asInstanceOf[ArrayData]))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("signBitsSelf", this, classOf[SignBits].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($self.compute($c));")
    }

    override protected def withNewChildInternal(newChild: Expression): SignBits =
      copy(child = newChild)
  }

  /** Two-pointer intersection COUNT of two ascending-sorted long arrays
    * with distinct elements (the oriented-adjacency contract in
    * [[graft.operators.Graph.triangleCount]]): equal to
    * `size(array_intersect(a, b))` on such inputs — array_intersect
    * builds an OpenHashSet PER ROW, this is one linear merge over
    * primitives (round 21: the intersect ran once per oriented edge, the
    * hottest inner loop of the whole graph family). Inputs that are not
    * sorted-distinct would under- or over-count silently, so the caller
    * contract is named in scaladoc and pinned by GraphSpec against the
    * array_intersect formulation. */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    private def elemOk(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    override def checkInputDataTypes(): TypeCheckResult =
      if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count needs array<bigint>, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "sorted_intersect_count"

    def compute(l: ArrayData, r: ArrayData): Long = {
      val nl = l.numElements()
      val nr = r.numElements()
      var i = 0
      var j = 0
      var c = 0L
      while (i < nl && j < nr) {
        rejectNullElement(l, i, "sorted_intersect_count")
        rejectNullElement(r, j, "sorted_intersect_count")
        val x = l.getLong(i)
        val y = r.getLong(j)
        if (x == y) { c += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
      c
    }

    override def nullSafeEval(l: Any, r: Any): Any =
      compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("sicSelf", this, classOf[SortedIntersectCount].getName)
      nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $self.compute($l, $r);")
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SortedIntersectCount =
      copy(left = newLeft, right = newRight)
  }

  def sorted_intersect_count(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def minhash_sig(hashes: Column, a: Array[Long], b: Array[Long], p: Long): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hashes), a, b, p))

  def simhash64(hashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(hashes)))

  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def sign_bits(vec: Column, planes: Array[Array[Double]], bitsPerWord: Int): Column =
    ColumnBridge.column(SignBits(ColumnBridge.expression(vec), planes, bitsPerWord))

  def shingle_hash(tokens: Column, n: Int): Column =
    ColumnBridge.column(ShingleHash(ColumnBridge.expression(tokens), n))
}
