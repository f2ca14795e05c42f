package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass mergeable sketch kernels — the codegen twins of the
  * md5-hex SQL formulations in `queries/SketchOps.scala` (which remain
  * the cross-engine parity spec; SketchSpec pins these bit-equal to it).
  *
  * Each sketch is a [[TypedImperativeAggregate]] over a small primitive
  * buffer (HLL: 256 bytes, CMS: 24 KiB, Bloom: 2 KiB), so a corpus scan
  * folds to ONE tiny binary per task before the exchange — the shuffle
  * is O(tasks) at any data scale, and sketches merge associatively
  * (partial agg, AQE re-plans, streaming state, cube rollups all free).
  * Hashing uses the raw md5 digest bytes directly: bucket/cell/bit
  * positions equal the SQL side's `conv(substr(md5(x),…),16,10)` because
  * hex chars ARE the digest bytes — no hex strings are materialized.
  *
  * Estimates are deterministic integer arithmetic plus (for HLL) ONE
  * IEEE division by a constant shared with the SQL literal — so even
  * the floating-point estimate is bit-identical across engines, plans
  * and partitionings.
  */
object Sketches {
  /** HLL registers: p=8 → m=256, one byte per register, rank ∈ [0,49]. */
  val HllM = 256
  /** 2^49 — scales Σ 2^-M_j into exact BIGINT arithmetic (M_j ≤ 49). */
  val HllScale = 562949953421312L
  /** alpha_m·m²·2^49 for m=256 — the ONE double constant of the HLL
    * estimate; SketchOps embeds the same shortest-repr literal in the
    * DuckDB oracle so both engines divide exactly-agreed operands. */
  val HllNum: Double =
    0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0 * 562949953421312.0

  /** Count-Min: 3 salted rows × 1024 cells of long counters. */
  val CmDepth = 3
  val CmWidth = 1024

  /** Bloom: 2^14 bits (2 KiB), k=2 16-bit md5 chunks folded mod m. */
  val BloomM = 16384

  /** Deterministic log-histogram bucket of a positive long column —
    * the quantile sketch's binning (values < 32 exact; else octave ×
    * 16 sub-buckets, ≤ 1/16 relative width — bounds and monotonicity
    * property-tested in SketchSpec). Counts per bucket are a plain
    * (partial-agg-friendly, addition-mergeable) aggregate; shared by
    * the batch query sketch_quantile_hist and streaming
    * [[graft.streaming.Sketches.windowedHistogram]] so the two can
    * never drift. */
  def logBucket(v: Column): Column = {
    import org.apache.spark.sql.functions._
    val blen = length(bin(v)).cast("int")
    when(v < 32, v).otherwise(
      lit(32) + (blen - 6) * 16 + (call_function("shiftright", v, blen - 5) - 16))
  }

  /** Inclusive value bounds of a [[logBucket]] bucket id. */
  def bucketLo(b: Column): Column = {
    import org.apache.spark.sql.functions._
    // (b-32) DIV 16 == (b-32) >> 4 for the non-negative log region
    val oct = call_function("shiftright", b - 32, lit(4)).cast("int") + 1
    when(b < 32, b).otherwise(
      call_function("shiftleft", pmod(b - 32, lit(16)) + 16, oct))
  }

  /** See [[bucketLo]]. */
  def bucketHi(b: Column): Column = {
    import org.apache.spark.sql.functions._
    val oct = call_function("shiftright", b - 32, lit(4)).cast("int") + 1
    when(b < 32, b).otherwise(
      call_function("shiftleft", pmod(b - 32, lit(16)) + 17, oct) - 1)
  }

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def md5(bytes: Array[Byte]): Array[Byte] = {
    val d = md5Local.get()
    d.reset()
    d.digest(bytes)
  }

  /** Fold one value into 256 HLL registers: bucket = digest byte 0
    * (hex chars 1-2), rank = leading zeros of the 48-bit value in bytes
    * 1..6 (hex chars 3-14) + 1; all-zero tail → 49. */
  def hllUpdate(buf: Array[Byte], value: UTF8String): Unit = {
    val d = md5(value.getBytes)
    val bucket = d(0) & 0xff
    var rem = 0L
    var i = 1
    while (i <= 6) { rem = (rem << 8) | (d(i) & 0xffL); i += 1 }
    val rho = if (rem == 0L) 49 else java.lang.Long.numberOfLeadingZeros(rem) - 15
    if (rho > buf(bucket)) buf(bucket) = rho.toByte
  }

  /** Wrong-size binaries mean the caller is querying something that is
    * not the matching sketch — fail loudly, never index garbage. */
  private def checkSize(buf: Array[Byte], want: Int, fn: String): Unit =
    require(buf.length == want,
      s"$fn: not a $want-byte sketch (${buf.length} bytes)")

  /** Register count with rank ≥ 1 — the SQL side's COUNT(*) over regs. */
  def hllNonzero(buf: Array[Byte]): Long = {
    checkSize(buf, HllM, "hll_nonzero")
    var n = 0L
    var i = 0
    while (i < HllM) { if (buf(i) != 0) n += 1; i += 1 }
    n
  }

  /** alpha·m²·2^49 / Σ 2^(49-M_j) — integer register sum (empty register
    * contributes 2^49), one shared-constant division. */
  def hllEstimate(buf: Array[Byte]): Double = {
    checkSize(buf, HllM, "hll_estimate")
    var s = 0L
    var i = 0
    while (i < HllM) { s += HllScale >>> buf(i); i += 1 }
    HllNum / s.toDouble
  }

  /** Cell of `value` in CMS row `r`: first 4 digest bytes of the salted
    * hash (hex chars 1-8) mod width — the SQL side's conv/substr. */
  def cmsCell(r: Int, value: UTF8String): Int = {
    val v = value.getBytes
    val salted = new Array[Byte](2 + v.length)
    salted(0) = ('0' + r).toByte
    salted(1) = '|'
    System.arraycopy(v, 0, salted, 2, v.length)
    val d = md5(salted)
    val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (h % CmWidth).toInt
  }

  /** Increment the value's cell in each of the 3 rows. The buffer is a
    * long[3·1024] grid serialized little-endian-free as 8-byte counters. */
  def cmsUpdate(grid: Array[Long], value: UTF8String): Unit = {
    var r = 0
    while (r < CmDepth) {
      grid(r * CmWidth + cmsCell(r, value)) += 1L
      r += 1
    }
  }

  /** Weighted [[cmsUpdate]]: add `w` occurrences of `value` in one
    * insert — counters are pure sums, so inserting a pre-aggregated
    * (value, count) row is bit-identical to `count` unit inserts. This
    * is what lets a CMS build run over a grouped relation (one hash per
    * DISTINCT value) instead of re-scanning every occurrence. */
  def cmsUpdateWeighted(grid: Array[Long], value: UTF8String, w: Long): Unit = {
    var r = 0
    while (r < CmDepth) {
      grid(r * CmWidth + cmsCell(r, value)) += w
      r += 1
    }
  }

  /** [[cmsQuery]] over the serialized grid — the scalar-expression entry
    * point, with the size check before any index arithmetic. */
  def cmsQueryBytes(sk: Array[Byte], value: UTF8String): Long = {
    checkSize(sk, CmDepth * CmWidth * 8, "cms_query")
    cmsQuery(bytesToLongs(sk), value)
  }

  /** Point-frequency estimate: min over the 3 row counters — one-sided
    * (≥ true count), exact when any row is collision-free for the key. */
  def cmsQuery(grid: Array[Long], value: UTF8String): Long = {
    var est = Long.MaxValue
    var r = 0
    while (r < CmDepth) {
      val c = grid(r * CmWidth + cmsCell(r, value))
      if (c < est) est = c
      r += 1
    }
    est
  }

  /** Bit positions of `value`: 16-bit digest chunks 0 and 1 (hex chars
    * 1-4 and 5-8) folded mod 2^14 — the SQL side's two conv/substr. */
  def bloomPos(i: Int, d: Array[Byte]): Int = {
    val h = ((d(2 * i) & 0xff) << 8) | (d(2 * i + 1) & 0xff)
    h % BloomM
  }

  def bloomUpdate(bits: Array[Byte], value: UTF8String): Unit = {
    val d = md5(value.getBytes)
    var i = 0
    while (i < 2) {
      val p = bloomPos(i, d)
      bits(p >>> 3) = (bits(p >>> 3) | (1 << (p & 7))).toByte
      i += 1
    }
  }

  /** Membership test: all k bit positions set (one-sided: never a false
    * negative; false positives at the documented load-dependent rate). */
  def bloomContains(bits: Array[Byte], value: UTF8String): Boolean = {
    checkSize(bits, BloomM / 8, "bloom_contains")
    val d = md5(value.getBytes)
    var i = 0
    while (i < 2) {
      val p = bloomPos(i, d)
      if ((bits(p >>> 3) & (1 << (p & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Grid → bytes (big-endian longs) for the agg serialize contract. */
  def longsToBytes(grid: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](grid.length * 8)
    var i = 0
    while (i < grid.length) {
      val v = grid(i)
      var k = 0
      while (k < 8) { out(i * 8 + k) = (v >>> (56 - 8 * k)).toByte; k += 1 }
      i += 1
    }
    out
  }

  def bytesToLongs(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) {
      var v = 0L
      var k = 0
      while (k < 8) { v = (v << 8) | (bytes(i * 8 + k) & 0xffL); k += 1 }
      out(i) = v
      i += 1
    }
    out
  }
}

/** Shared shape of the three sketch aggregates: a fixed-size primitive
  * buffer updated per row, merged associatively, evaluated to its
  * serialized BinaryType form (so sketches can be stored, re-merged and
  * queried as first-class values). Null inputs are skipped. */
abstract class SketchAgg[B >: Null <: AnyRef]
    extends TypedImperativeAggregate[B] with UnaryLike[Expression]
    with ExpectsInputTypes {
  def child: Expression
  override def inputTypes = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  protected def updateWith(buffer: B, value: UTF8String): Unit

  final override def update(buffer: B, input: InternalRow): B = {
    val v = child.eval(input)
    if (v != null) updateWith(buffer, v.asInstanceOf[UTF8String])
    buffer
  }
}

/** `hll_sketch(x)` — 256 HLL registers of the distinct values of `x`,
  * as a 256-byte binary; query with [[HllEstimate]] / [[HllNonzero]],
  * re-merge with [[HllMergeAgg]]. */
case class HllSketchAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends SketchAgg[Array[Byte]] {
  override def prettyName: String = "hll_sketch"
  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Sketches.HllM)
  override protected def updateWith(buf: Array[Byte], v: UTF8String): Unit =
    Sketches.hllUpdate(buf, v)
  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < Sketches.HllM) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }
  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(storage: Array[Byte]): Array[Byte] = storage
  override def withNewMutableAggBufferOffset(n: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)
}

/** `hll_merge(sketch)` — re-merge stored HLL sketches (register-wise
  * max): the rollup path — per-shard/per-day sketches combine into any
  * coarser distinct count without touching the data again. */
case class HllMergeAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression]
    with ExpectsInputTypes {
  override def prettyName: String = "hll_merge"
  override def inputTypes = Seq(BinaryType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Sketches.HllM)
  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) merge(buf, v.asInstanceOf[Array[Byte]])
    buf
  }
  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    require(other.length == Sketches.HllM,
      s"hll_merge: not a ${Sketches.HllM}-byte HLL sketch (${other.length} bytes)")
    var i = 0
    while (i < Sketches.HllM) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }
  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(storage: Array[Byte]): Array[Byte] = storage
  override def withNewMutableAggBufferOffset(n: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): HllMergeAgg =
    copy(child = newChild)
}

/** `cms_sketch(x)` — 3×1024 Count-Min counter grid as a 24 KiB binary;
  * point-query with [[CmsQuery]]. Counters merge by addition. */
case class CmsSketchAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends SketchAgg[Array[Long]] {
  override def prettyName: String = "cms_sketch"
  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](Sketches.CmDepth * Sketches.CmWidth)
  override protected def updateWith(grid: Array[Long], v: UTF8String): Unit =
    Sketches.cmsUpdate(grid, v)
  override def merge(grid: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < grid.length) { grid(i) += other(i); i += 1 }
    grid
  }
  override def eval(grid: Array[Long]): Any = Sketches.longsToBytes(grid)
  override def serialize(grid: Array[Long]): Array[Byte] = Sketches.longsToBytes(grid)
  override def deserialize(storage: Array[Byte]): Array[Long] =
    Sketches.bytesToLongs(storage)
  override def withNewMutableAggBufferOffset(n: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): CmsSketchAgg =
    copy(child = newChild)
}

/** `cms_sketch_weighted(x, w)` — [[CmsSketchAgg]] with a per-row weight:
  * adds `w` occurrences of `x` in one insert. Counters are pure sums, so
  * building over a pre-grouped (value, count) relation is bit-identical
  * to unit inserts over every occurrence (SketchSpec pins it) while
  * hashing each DISTINCT value once. Null value or null weight skips the
  * row, like the unary sketches. */
case class CmsSketchWeightedAgg(left: Expression, right: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression]
    with ExpectsInputTypes {
  override def prettyName: String = "cms_sketch_weighted"
  override def inputTypes = Seq(StringType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](Sketches.CmDepth * Sketches.CmWidth)
  override def update(grid: Array[Long], input: InternalRow): Array[Long] = {
    val v = left.eval(input)
    val w = right.eval(input)
    if (v != null && w != null)
      Sketches.cmsUpdateWeighted(grid, v.asInstanceOf[UTF8String],
        w.asInstanceOf[Long])
    grid
  }
  override def merge(grid: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < grid.length) { grid(i) += other(i); i += 1 }
    grid
  }
  override def eval(grid: Array[Long]): Any = Sketches.longsToBytes(grid)
  override def serialize(grid: Array[Long]): Array[Byte] = Sketches.longsToBytes(grid)
  override def deserialize(storage: Array[Byte]): Array[Long] =
    Sketches.bytesToLongs(storage)
  override def withNewMutableAggBufferOffset(n: Int): CmsSketchWeightedAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CmsSketchWeightedAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsSketchWeightedAgg =
    copy(left = newLeft, right = newRight)
}

/** `bloom_sketch(x)` — 2 KiB Bloom bitset of the values of `x`;
  * membership via [[BloomContains]]. Bitsets merge by OR. */
case class BloomSketchAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends SketchAgg[Array[Byte]] {
  override def prettyName: String = "bloom_sketch"
  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](Sketches.BloomM / 8)
  override protected def updateWith(bits: Array[Byte], v: UTF8String): Unit =
    Sketches.bloomUpdate(bits, v)
  override def merge(bits: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < bits.length) { bits(i) = (bits(i) | other(i)).toByte; i += 1 }
    bits
  }
  override def eval(bits: Array[Byte]): Any = bits
  override def serialize(bits: Array[Byte]): Array[Byte] = bits
  override def deserialize(storage: Array[Byte]): Array[Byte] = storage
  override def withNewMutableAggBufferOffset(n: Int): BloomSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): BloomSketchAgg =
    copy(child = newChild)
}

/** `hll_estimate(sketch)` — the deterministic HLL cardinality estimate
  * (see [[Sketches.hllEstimate]]). */
case class HllEstimate(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "hll_estimate"
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any =
    Sketches.hllEstimate(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.Sketches.hllEstimate($b)")
  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}

/** `hll_nonzero(sketch)` — populated-register count. */
case class HllNonzero(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "hll_nonzero"
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    Sketches.hllNonzero(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.Sketches.hllNonzero($b)")
  override protected def withNewChildInternal(newChild: Expression): HllNonzero =
    copy(child = newChild)
}

/** `cms_query(sketch, x)` — Count-Min point-frequency estimate of `x`. */
case class CmsQuery(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "cms_query"
  override def inputTypes = Seq(BinaryType, StringType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(sk: Any, v: Any): Any =
    Sketches.cmsQueryBytes(sk.asInstanceOf[Array[Byte]], v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (sk, v) =>
      s"graft.functions.Sketches.cmsQueryBytes($sk, $v)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsQuery =
    copy(left = newLeft, right = newRight)
}

/** `bloom_contains(sketch, x)` — Bloom membership (no false negatives). */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "bloom_contains"
  override def inputTypes = Seq(BinaryType, StringType)
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(sk: Any, v: Any): Any =
    Sketches.bloomContains(sk.asInstanceOf[Array[Byte]], v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (sk, v) =>
      s"graft.functions.Sketches.bloomContains($sk, $v)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
