package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact 128-bit helpers for the Lloyd-family scaled-distance argmin.
  *
  * The Lloyd rounds carry a trained centroid as its EXACT (n, Σ)
  * integer pair and compare `sqrt(Σ(n·q_i − s_i)²)/(n·scale)` — the
  * v14/v18 exactness trick. The Σ passes 2⁶³, so the previous form
  * rode Decimal(38,0) Catalyst arithmetic: ~nlist·dim Decimal
  * multiply/subtract/square/add allocations PER ROW per round (~5.1B
  * Decimal ops per training pass at the data-bound point). These
  * kernels keep the identical VALUE SEMANTICS — an exact integer sum,
  * then ONE correctly-rounded (round-to-nearest-even) conversion to
  * double, then the same IEEE sqrt/divide — in zero-allocation
  * hi/lo-carry long arithmetic (the [[GramAggregate]] int128 pattern).
  *
  * Equivalence contract (Int128ArgminSpec proves it on
  * overflow-adjacent inputs): Spark's Decimal(38,0)→Double cast is
  * `java.math.BigDecimal.doubleValue`, which is correctly rounded
  * (values ≤ Long.MaxValue convert via the exact long→double
  * primitive conversion; larger values via `Double.parseDouble
  * (toString)` — both RNE). [[Int128.toDouble]] reproduces that
  * rounding bit-for-bit, so every candidate's `dist` double — and
  * therefore every (dist, lab) lexicographic argmin — is unchanged
  * from the Decimal form, and the DuckDB twins (HUGEINT→DOUBLE, also
  * correctly rounded) keep matching.
  *
  * Exactness bounds (internal contract — these expressions are NOT on
  * the public SQL surface): each per-dim difference `n·q_i − s_i`
  * must fit int64 and the squared sum must fit 127 bits. At quantize
  * scale 10⁴ with |emb| ≤ ~10 that holds to n ≈ 10¹² members per
  * cluster — past any 100 TB corpus.
  */
object Int128 {

  /** Correctly-rounded (RNE) double of the non-negative 128-bit value
    * hi·2⁶⁴ + (lo unsigned). Requires hi ≥ 0 (sums of squares only).
    * Matches `BigDecimal.doubleValue` / `BigInteger.doubleValue`. */
  def toDouble(hi: Long, lo: Long): Double = {
    if (hi == 0L && lo >= 0L) return lo.toDouble // ≤63 bits: JLS long→double is RNE
    // nbits in 64..127; round the top 54 bits (53 mantissa + round bit)
    // with a sticky OR of everything below — textbook RNE.
    val nbits =
      if (hi == 0L) 64
      else 128 - java.lang.Long.numberOfLeadingZeros(hi)
    val shift = nbits - 54 // ≥ 10
    var top54 = 0L
    var sticky = false
    if (shift >= 64) {
      val s = shift - 64 // 0..9
      top54 = hi >>> s
      sticky = (s > 0 && (hi & ((1L << s) - 1L)) != 0L) || lo != 0L
    } else { // 10 ≤ shift ≤ 63
      top54 = (hi << (64 - shift)) | (lo >>> shift)
      sticky = (lo & ((1L << shift) - 1L)) != 0L
    }
    val roundBit = (top54 & 1L) != 0L
    var mant = top54 >>> 1
    if (roundBit && (sticky || (mant & 1L) != 0L)) mant += 1L
    // mant ≤ 2⁵³ (the carry-to-next-binade case is exact in double)
    java.lang.Math.scalb(mant.toDouble, shift + 1)
  }

  /** The shared inner kernel: dist = sqrt(Σ_{i<len}(n·qv[qOff+i] −
    * sv[sOff+i])²)/nScale with the Σ exact in int128. */
  def scaledDist(qv: ArrayData, qOff: Int, n: Long, sv: Array[Long],
                 sOff: Int, len: Int, nScale: Double): Double = {
    var hi = 0L
    var lo = 0L
    var i = 0
    while (i < len) {
      val d = n * qv.getLong(qOff + i) - sv(sOff + i)
      val pLo = d * d
      val pHi = java.lang.Math.multiplyHigh(d, d)
      val l1 = lo + pLo
      hi += pHi + (if (java.lang.Long.compareUnsigned(l1, lo) < 0) 1L
                   else 0L)
      lo = l1
      i += 1
    }
    java.lang.Math.sqrt(toDouble(hi, lo)) / nScale
  }

  /** Lexicographic (dist, lab) less-than with Spark's DoubleType
    * ordering (java.lang.Double.compare — matches struct array_min /
    * array_sort; dists here are non-negative and never NaN). */
  @inline def labLess(d1: Double, l1: Long, d2: Double, l2: Long): Boolean = {
    val c = java.lang.Double.compare(d1, d2)
    c < 0 || (c == 0 && l1 < l2)
  }
}

/** The k nearest grid labels of a quantized vector under the exact
  * scaled distance — the native form of the Lloyd-round literal-argmin
  * projection (`array_min`/`array_sort` over nlist Decimal-summed
  * (dist, lab) candidate structs). k = 1 returns the winning lab as
  * LongType (assignment / ADD — no per-row array allocation); k > 1
  * returns array<long> of the k labs in (dist, lab) order (nprobe
  * routing). Bit-identical to the Decimal form (see [[Int128]]).
  *
  * The grid ships as literal Seqs (collected class sums — broadcast-
  * sized by the Lloyd contract), so the projection stays map-only and
  * the case-class keeps structural equality for Catalyst. */
case class GridNearestLabs(child: Expression, labs: Seq[Long],
                           ns: Seq[Long], svecs: Seq[Long], dim: Int,
                           scale: Long, k: Int)
    extends UnaryExpression {
  require(k >= 1 && k <= labs.length,
    s"graft_grid_nearest: k=$k out of range for ${labs.length} candidates")
  require(svecs.length == labs.length * dim && ns.length == labs.length,
    "graft_grid_nearest: ragged grid")

  override def prettyName: String = "graft_grid_nearest"
  override def dataType: DataType =
    if (k == 1) LongType else ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"input must be array<bigint>, got $t")
    }

  @transient private lazy val labArr: Array[Long] = labs.toArray
  @transient private lazy val nArr: Array[Long] = ns.toArray
  @transient private lazy val svArr: Array[Long] = svecs.toArray
  @transient private lazy val nScaleArr: Array[Double] =
    nArr.map(n => (n * scale).toDouble)

  /** Fills bl with the k nearest labs in (dist, lab) order. */
  private def fillNearest(qv: ArrayData, bd: Array[Double],
                          bl: Array[Long]): Unit = {
    require(qv.numElements() == dim,
      s"graft_grid_nearest: vector length ${qv.numElements()} != $dim")
    val nc = labArr.length
    var filled = 0
    var c = 0
    while (c < nc) {
      val dist = Int128.scaledDist(qv, 0, nArr(c), svArr, c * dim, dim,
        nScaleArr(c))
      val lab = labArr(c)
      var pos = filled
      while (pos > 0 && Int128.labLess(dist, lab, bd(pos - 1), bl(pos - 1)))
        pos -= 1
      if (pos < k) {
        var j = math.min(filled, k - 1)
        while (j > pos) { bd(j) = bd(j - 1); bl(j) = bl(j - 1); j -= 1 }
        bd(pos) = dist
        bl(pos) = lab
        if (filled < k) filled += 1
      }
      c += 1
    }
  }

  /** k = 1 fast path: the winning lab with zero per-row allocation. */
  def computeLab(qv: ArrayData): Long = {
    require(qv.numElements() == dim,
      s"graft_grid_nearest: vector length ${qv.numElements()} != $dim")
    var bestD = java.lang.Double.POSITIVE_INFINITY
    var bestLab = java.lang.Long.MAX_VALUE
    var c = 0
    while (c < labArr.length) {
      val dist = Int128.scaledDist(qv, 0, nArr(c), svArr, c * dim, dim,
        nScaleArr(c))
      if (Int128.labLess(dist, labArr(c), bestD, bestLab)) {
        bestD = dist
        bestLab = labArr(c)
      }
      c += 1
    }
    bestLab
  }

  def computeArr(qv: ArrayData): ArrayData = {
    val bd = new Array[Double](k)
    val bl = new Array[Long](k)
    fillNearest(qv, bd, bl)
    new GenericArrayData(bl)
  }

  override def nullSafeEval(input: Any): Any = {
    val qv = input.asInstanceOf[ArrayData]
    if (k == 1) computeLab(qv) else computeArr(qv)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gridNearest", this,
      classOf[GridNearestLabs].getName)
    nullSafeCodeGen(ctx, ev, c =>
      if (k == 1) s"${ev.value} = $ref.computeLab($c);"
      else s"${ev.value} = $ref.computeArr($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** All m per-subspace argmin codes of a PQ training round in ONE pass —
  * the native form of trainedPqBook's round projection (m per-subspace
  * `array_min`s over Decimal-summed candidate structs on the sliced
  * vector). Candidates arrive as the collected (lab, n, Σ) grid sorted
  * by lab (lab = subspace·ksub + cid, empty cells already dropped);
  * output is the length-m array<long> of winning cids. Bit-identical
  * to the Decimal form (see [[Int128]]). */
case class PqGridArgmin(child: Expression, m: Int, sub: Int, ksub: Int,
                        labs: Seq[Long], ns: Seq[Long], svecs: Seq[Long],
                        scale: Long)
    extends UnaryExpression {
  require(svecs.length == labs.length * sub && ns.length == labs.length,
    "graft_pq_grid_argmin: ragged grid")

  override def prettyName: String = "graft_pq_grid_argmin"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"input must be array<bigint>, got $t")
    }

  @transient private lazy val labArr: Array[Long] = labs.toArray
  @transient private lazy val nArr: Array[Long] = ns.toArray
  @transient private lazy val svArr: Array[Long] = svecs.toArray
  @transient private lazy val nScaleArr: Array[Double] =
    nArr.map(n => (n * scale).toDouble)
  /** Candidate range [jStart(j), jStart(j+1)) per subspace — labs are
    * sorted, so each subspace's cells are contiguous. Every subspace
    * must keep ≥1 live cell (an empty subspace would have made the
    * previous form's array_min NULL — fail loudly instead). */
  @transient private lazy val jStart: Array[Int] = {
    val starts = new Array[Int](m + 1)
    var c = 0
    var j = 0
    while (j < m) {
      starts(j) = c
      while (c < labArr.length && labArr(c) / ksub == j) {
        require(c == starts(j) || labArr(c) > labArr(c - 1),
          "graft_pq_grid_argmin: grid labs not sorted")
        c += 1
      }
      require(c > starts(j),
        s"graft_pq_grid_argmin: subspace $j has no live cells")
      j += 1
    }
    require(c == labArr.length,
      "graft_pq_grid_argmin: grid labs out of subspace range")
    starts(m) = c
    starts
  }

  def compute(qv: ArrayData): ArrayData = {
    require(qv.numElements() == m * sub,
      s"graft_pq_grid_argmin: vector length ${qv.numElements()} != ${m * sub}")
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      var bestD = java.lang.Double.POSITIVE_INFINITY
      var bestLab = java.lang.Long.MAX_VALUE
      var c = jStart(j)
      val end = jStart(j + 1)
      while (c < end) {
        val dist = Int128.scaledDist(qv, j * sub, nArr(c), svArr,
          c * sub, sub, nScaleArr(c))
        if (Int128.labLess(dist, labArr(c), bestD, bestLab)) {
          bestD = dist
          bestLab = labArr(c)
        }
        c += 1
      }
      out(j) = bestLab % ksub
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqGridArgmin", this,
      classOf[PqGridArgmin].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object GridArgmin {
  /** The nearest grid lab (LongType) of a quantized vector column —
    * the Lloyd assignment / ADD projection. */
  def nearestLab(qv: Column, grid: Array[(Long, Long, Array[Long])],
                 scale: Long): Column = nearestLabs(qv, grid, scale, 1)

  /** The k nearest grid labs of a quantized vector column, in
    * (dist, lab) order — k = 1 yields LongType, k > 1 array<long>. */
  def nearestLabs(qv: Column, grid: Array[(Long, Long, Array[Long])],
                  scale: Long, k: Int): Column = {
    val dim = grid.head._3.length
    GraftSqlBridge.column(GridNearestLabs(GraftSqlBridge.expression(qv),
      grid.map(_._1).toIndexedSeq, grid.map(_._2).toIndexedSeq,
      grid.flatMap(_._3).toIndexedSeq, dim, scale, k))
  }

  /** The length-m PQ round codes of a quantized vector column from a
    * collected (lab, n, Σ) subspace grid. */
  def pqCodes(qv: Column, grid: Array[(Long, Long, Array[Long])],
              m: Int, sub: Int, ksub: Int, scale: Long): Column =
    GraftSqlBridge.column(PqGridArgmin(GraftSqlBridge.expression(qv),
      m, sub, ksub, grid.map(_._1).toIndexedSeq,
      grid.map(_._2).toIndexedSeq, grid.flatMap(_._3).toIndexedSeq, scale))
}
