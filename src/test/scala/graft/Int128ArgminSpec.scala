package graft

import java.math.BigInteger

import graft.plans.{GridArgmin, Int128}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Proves the int128 grid-argmin kernel (graft.plans.GridArgminExpressions)
  * is BIT-IDENTICAL to the Decimal(38,0) Catalyst form it replaced —
  * the v14/v18 scaled-distance exactness trick
  * `dist = sqrt(Σ(n·q_i − s_i)²)/(n·scale)` that the Lloyd-family
  * training passes (v18/v26/v65/v68/v70/v78 and the persisted trained
  * chains) argmin over. The Decimal reference form lives HERE now
  * (lifted verbatim from the pre-round-10 Queries.lloydCands /
  * roundCandsPq), so the equivalence stays checkable forever.
  *
  * The only rounding step in either form is the one conversion of the
  * exact integer Σ to double: Spark's Decimal(38,0)→Double cast is
  * java.math.BigDecimal.doubleValue (correctly rounded RNE);
  * Int128.toDouble reproduces it bit-for-bit, which the first test
  * hammers on adversarial 128-bit patterns (powers of two, rounding
  * ties, carry-to-next-binade, >2⁶³ sums). */
class Int128ArgminSpec extends SparkSpec {
  import spark.implicits._

  private val dec = org.apache.spark.sql.types.DecimalType(38, 0)
  private val scaleL = graft.functions.VectorFunctions.DefaultScale.toLong

  // ---- the pre-round-10 Decimal reference forms, verbatim ----

  private def decimalCands(
      cs: Array[(Long, Long, Array[Long])]): Seq[Column] =
    cs.toIndexedSeq.map { case (lab, n, svec) =>
      val sLit = array(svec.map(lit(_)).toIndexedSeq: _*)
      val a2 = aggregate(
        zip_with(col("qv"), sLit, (qi, si) => {
          val diff = lit(n).cast(dec) * qi.cast(dec) - si.cast(dec)
          diff * diff
        }),
        lit(0L).cast(dec), (acc, x) => acc + x)
      struct((sqrt(a2) / lit(n * scaleL).cast("double")).as("dist"),
        lit(lab).as("lab"))
    }

  private def decimalCandsPq(sums: Array[(Long, Long, Array[Long])],
                             ksub: Int, sub: Int): Int => Seq[Column] =
    (j: Int) =>
      sums.filter(_._1 / ksub == j).toIndexedSeq.map {
        case (lab, n, svec) =>
          val sLit = array(svec.map(lit(_)).toIndexedSeq: _*)
          val a2 = aggregate(
            zip_with(slice(col("qv"), j * sub + 1, sub), sLit,
              (qi, si) => {
                val diff = lit(n).cast(dec) * qi.cast(dec) - si.cast(dec)
                diff * diff
              }),
            lit(0L).cast(dec), (acc, x) => acc + x)
          struct((sqrt(a2) / lit(n * scaleL).cast("double")).as("dist"),
            lit(lab % ksub).as("cid"))
      }

  private def refDouble(hi: Long, lo: Long): Double = {
    val bi = BigInteger.valueOf(hi).shiftLeft(64)
      .add(new BigInteger(java.lang.Long.toUnsignedString(lo)))
    new java.math.BigDecimal(bi).doubleValue()
  }

  test("Int128.toDouble == BigDecimal.doubleValue on adversarial " +
    "128-bit patterns (ties, binade edges, sticky-only bits, >2^63)") {
    val rnd = new scala.util.Random(1283)
    val cases = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    // exhaustive-ish small values and around every power of two
    for (b <- 0 to 126; d <- -2 to 2) {
      val v = BigInteger.ONE.shiftLeft(b).add(BigInteger.valueOf(d.toLong))
      if (v.signum >= 0 && v.bitLength <= 127) {
        val lo = v.longValue()
        val hi = v.shiftRight(64).longValue()
        cases += ((hi, lo))
      }
    }
    // exact rounding ties: (2k+1)·2^(b−53) for b > 53 — the round bit
    // set, sticky clear, so RNE must go to even
    for (b <- 55 to 126; _ <- 1 to 4) {
      val mant = (rnd.nextLong() & ((1L << 52) - 1)) | (1L << 52)
      val v = BigInteger.valueOf(2 * (mant & ((1L << 52) - 1)) + 1)
        .or(BigInteger.ONE.shiftLeft(53))
        .shiftLeft(b - 53)
      if (v.bitLength <= 127) {
        cases += ((v.shiftRight(64).longValue(), v.longValue()))
      }
      // and the same tie with one sticky bit set below → round up
      val vs = v.add(BigInteger.ONE)
      if (vs.bitLength <= 127)
        cases += ((vs.shiftRight(64).longValue(), vs.longValue()))
    }
    // random full-range values
    for (_ <- 1 to 20000) {
      val bits = 1 + rnd.nextInt(127)
      val v = new BigInteger(bits, rnd.self)
      cases += ((v.shiftRight(64).longValue(), v.longValue()))
    }
    cases.foreach { case (hi, lo) =>
      val got = Int128.toDouble(hi, lo)
      val want = refDouble(hi, lo)
      assert(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(want),
        s"hi=$hi lo=$lo: got $got want $want")
    }
  }

  /** Random grid with overflow-adjacent magnitudes: n large enough
    * that n·q_i−s_i squares past 2⁶³ and the Σ crosses both the
    * 2⁶³ and 2⁶⁴ boundaries — exactly where a Long form would wrap
    * and a sloppy double conversion would diverge. */
  private def randomGrid(rnd: scala.util.Random, nCands: Int, dim: Int,
                         labOf: Int => Long)
      : Array[(Long, Long, Array[Long])] =
    Array.tabulate(nCands) { c =>
      // n up to ~4·10⁷ (the 100 TB gallery bound), q up to ~10⁵
      val n = 1L + (rnd.nextLong().abs % 40000000L)
      val svec = Array.fill(dim)(
        (rnd.nextLong() % (n * 100000L)).abs * (if (rnd.nextBoolean()) 1
                                                else -1))
      (labOf(c), n, svec)
    }

  private def randomVecs(rnd: scala.util.Random, n: Int, dim: Int) =
    (1 to n).map { i =>
      (i.toLong, Seq.fill(dim)((rnd.nextLong() % 100000L)))
    }.toDF("id", "qv")

  test("GridNearestLabs(k=1,2) == Decimal candidate argmin/sort on " +
    "overflow-adjacent random grids") {
    val rnd = new scala.util.Random(97)
    for (trial <- 1 to 3) {
      val dim = Seq(8, 16, 64)(trial - 1)
      val cs = randomGrid(rnd, nCands = 10, dim, c => c.toLong)
      // duplicate one candidate to force an exact (dist, lab) tie —
      // the lab tie-break must agree too
      val csT = cs :+ ((10L, cs(3)._2, cs(3)._3))
      val vecs = randomVecs(rnd, 300, dim)
      val cands = decimalCands(csT)
      val rows = vecs.select(col("id"),
          graft.plans.GridArgmin.nearestLab(col("qv"), csT, scaleL)
            .as("got1"),
          graft.plans.GridArgmin.nearestLabs(col("qv"), csT, scaleL, 2)
            .as("got2"),
          array_min(array(cands: _*)).getField("lab").as("want1"),
          array_sort(array(cands: _*)).as("wantSorted"))
        .collect()
      rows.foreach { r =>
        assert(r.getLong(1) == r.getLong(3),
          s"k=1 argmin diverged for id=${r.getLong(0)}")
        val got2 = r.getSeq[Long](2)
        val ws = r.getSeq[org.apache.spark.sql.Row](4)
        assert(got2 == Seq(ws(0).getLong(1), ws(1).getLong(1)),
          s"k=2 routing diverged for id=${r.getLong(0)}: " +
            s"$got2 vs ${ws.take(2)}")
      }
    }
  }

  test("PqGridArgmin == per-subspace Decimal argmin on random grids " +
    "with empty cells") {
    val rnd = new scala.util.Random(131)
    val m = 8; val sub = 8; val ksub = 16; val dim = m * sub
    // drop ~1/4 of cells (empty clusters survive training rounds)
    val full = randomGrid(rnd, nCands = m * ksub, sub, c => c.toLong)
      .filter(x => x._1 % ksub < 2 || rnd.nextDouble() > 0.25)
    val vecs = randomVecs(rnd, 300, dim)
    val candsOf = decimalCandsPq(full, ksub, sub)
    val wantCodes = array((0 until m).map(j =>
      array_min(array(candsOf(j): _*)).getField("cid")): _*)
    val rows = vecs.select(col("id"),
        graft.plans.GridArgmin.pqCodes(col("qv"), full, m, sub, ksub,
          scaleL).as("got"),
        wantCodes.as("want"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"codes diverged for id=${r.getLong(0)}: " +
          s"${r.getSeq[Long](1)} vs ${r.getSeq[Long](2)}")
    }
  }

  test("PqGridArgmin fails loudly on an empty subspace and a ragged " +
    "vector; GridNearestLabs rejects bad k") {
    val grid = Array((0L, 2L, Array(1L, 2L)), (1L, 3L, Array(4L, 5L)))
    // subspace 1 has no cells (labs 0,1 are both subspace 0 at ksub=16)
    val df = Seq((1L, Seq(1L, 2L, 3L, 4L))).toDF("id", "qv")
    val ex = intercept[Exception] {
      df.select(GridArgmin.pqCodes(col("qv"), grid, m = 2, sub = 2,
        ksub = 16, scaleL)).collect()
    }
    assert(ex.getMessage != null)
    assertThrows[IllegalArgumentException] {
      GridArgmin.nearestLabs(col("qv"), grid, scaleL, k = 3)
    }
    val ex2 = intercept[Exception] {
      Seq((1L, Seq(1L, 2L, 3L))).toDF("id", "qv")
        .select(GridArgmin.nearestLab(col("qv"), grid, scaleL)).collect()
    }
    assert(ex2.getMessage != null)
  }
}
