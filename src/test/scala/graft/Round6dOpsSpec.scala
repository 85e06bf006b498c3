package graft

import graft.queries.Queries
import org.apache.spark.sql.functions._

/** Invariant specs for the round-6d batch: SQ8 reconstruction error
  * (v47), product profit (q33), PMI collocations (t22), RFM segments
  * (e23). Exact value parity is covered by the DuckDB oracle gate;
  * these assert the semantic properties the oracle can't name.
  */
class Round6dOpsSpec extends SparkSpec {
  import spark.implicits._

  test("v47: one row; sum_err matches an exact Scala replay of the " +
    "SQ8 residuals; mean = sum/n") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(graft.functions.VectorFunctions.quantize($"embedding"))
      .as[Seq[Long]].collect().map(_.toArray)
    val dim = vecs.head.length
    val mns = (0 until dim).map(i => vecs.map(_(i)).min).toArray
    val rgs = (0 until dim).map(i =>
      math.max(vecs.map(_(i)).max - mns(i), 1L)).toArray
    val errs = vecs.map { v =>
      (0 until dim).map { i =>
        val r = ((v(i) - mns(i)) * 255L) % rgs(i)
        r * r
      }.sum
    }
    val row = Queries.v47Sq8Error(spark, sf).collect().head
    assert(row.getAs[Long]("n") == vecs.length)
    assert(row.getAs[Long]("sum_err") == errs.sum)
    assert(row.getAs[Long]("max_err") == errs.max)
    assert(row.getAs[Double]("mean_err") ==
      errs.sum.toDouble / vecs.length)
  }

  test("q33: line counts partition lineitem; nations and years come " +
    "from the dimensions") {
    val out = Queries.q33ProductProfit(spark, sf).collect()
    val nLines = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(out.map(_.getAs[Long]("n_lines")).sum == nLines)
    val nations = spark.read.parquet(s"$sf/nation.parquet")
      .select($"n_name".as[String]).collect().toSet
    assert(out.map(_.getAs[String]("n_name")).toSet.subsetOf(nations))
    assert(out.map(_.getAs[Long]("year")).forall(y => y >= 1992 && y <= 2005))
  }

  test("t22: 10 rows ranked 1..10 by non-increasing score; every " +
    "score replays exactly from the corpus counts") {
    val out = Queries.t22PmiBigrams(spark, sf).orderBy("rnk").collect()
    assert(out.length == 10)
    assert(out.map(_.getAs[Long]("rnk")).toSeq == (1L to 10L))
    val scores = out.map(_.getAs[Double]("score"))
    assert(scores.sliding(2).forall(w => w(0) >= w(1)))
    assert(out.forall(_.getAs[Long]("c_xy") >= 5))
    // replay the count arithmetic from the raw corpus
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select($"text".as[String]).collect()
      .filter(_ != null).map(_.split(" ", -1).toSeq)
    val uni = toks.flatten.groupBy(identity).map { case (t, xs) =>
      t -> xs.length.toLong }
    val n = uni.values.sum
    val big = toks.filter(_.length >= 2)
      .flatMap(ts => ts.zip(ts.tail).map { case (a, b) => s"$a $b" })
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    out.foreach { r =>
      val Array(x, y) = r.getAs[String]("bigram").split(" ")
      assert(r.getAs[Long]("c_xy") == big(r.getAs[String]("bigram")))
      assert(r.getAs[Long]("c_x") == uni(x))
      assert(r.getAs[Long]("c_y") == uni(y))
      assert(r.getAs[Double]("score") ==
        (n * r.getAs[Long]("c_xy")).toDouble
          / (uni(x) * uni(y)))
    }
  }

  test("v48: one row per label; margin replays exactly from BigInt " +
    "(sum, n) arithmetic; nearest label differs from the label") {
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"label".cast("long"),
        graft.functions.VectorFunctions.quantize($"embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val byLab = rows.groupBy(_._1)
    val sums = byLab.map { case (l, vs) =>
      l -> (vs.map(_._2).transpose.map(_.map(BigInt(_)).sum).toArray,
        BigInt(vs.length))
    }
    def d2(a: Long, b: Long): Double = {
      val (sa, na) = sums(a); val (sb, nb) = sums(b)
      val num = sa.zip(sb).map { case (x, y) =>
        val t = x * nb - y * na; t * t }.sum
      num.toDouble / (na * na * nb * nb).toDouble
    }
    val out = Queries.v48CentroidMargin(spark, sf).collect()
    assert(out.length == sums.size)
    out.foreach { r =>
      val l = r.getAs[Long]("label_id")
      val best = sums.keys.filter(_ != l)
        .map(o => (d2(l, o), o)).minBy(identity)
      assert(r.getAs[Long]("nearest_label") == best._2)
      assert(r.getAs[Double]("margin_d2") == best._1)
      assert(r.getAs[Long]("n") == sums(l)._2.toLong)
    }
  }

  test("q34: both date columns are midnight-aligned so trunc/floor " +
    "division agree even on negative deltas; counts partition " +
    "lineitem; mean = sum/n") {
    val out = Queries.q34ShipLatency(spark, sf).collect()
    val nLines = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(out.map(_.getAs[Long]("n_lines")).sum == nLines)
    out.foreach { r =>
      assert(r.getAs[Double]("mean_delay") ==
        r.getAs[Long]("sum_delay").toDouble / r.getAs[Long]("n_lines"))
    }
    // midnight alignment makes every µs delta an exact day multiple,
    // which is what keeps Spark's `div` == DuckDB's `//` for negatives
    val misaligned = graft.sources.Tables.lineitem(spark, sf)
      .filter(pmod(unix_micros($"l_shipdate".cast("timestamp")),
        lit(86400000000L)) =!= 0)
      .count() +
      graft.sources.Tables.orders(spark, sf)
        .filter(pmod(unix_micros($"o_orderdate".cast("timestamp")),
          lit(86400000000L)) =!= 0)
        .count()
    assert(misaligned == 0)
  }

  test("d21: manifest partitions the corpus; reps are group minima") {
    val out = Queries.d21NormalizedDedup(spark, sf).collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == nDocs)
    assert(out.forall(_.getAs[Long]("n_docs") >= 1))
    assert(out.map(_.getAs[String]("norm_hash")).distinct.length ==
      out.length)
  }

  test("m9: p50 <= p90 <= max per modality; medians replay from a " +
    "sorted positional pick") {
    val out = Queries.m9SizeQuantiles(spark, sf).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Long]("p50_bytes") <= r.getAs[Long]("p90_bytes"))
      assert(r.getAs[Long]("p90_bytes") <= r.getAs[Long]("max_bytes"))
    }
    val sizes = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"text".isNotNull)
      .select($"doc_id".cast("long"), octet_length($"text").cast("long"))
      .collect().map(r => (r.getLong(0) % 3, r.getLong(1)))
      .groupBy { case (m, _) => Seq("image", "audio", "video")(m.toInt) }
    out.foreach { r =>
      val xs = sizes(r.getAs[String]("modality")).map(_._2).sorted
      val n = xs.length
      assert(r.getAs[Long]("n_assets") == n)
      def pick(p: Int): Long = xs(((p * n + 99) / 100 - 1).toInt)
      assert(r.getAs[Long]("p50_bytes") == pick(50))
      assert(r.getAs[Long]("p90_bytes") == pick(90))
      assert(r.getAs[Long]("max_bytes") == xs.max)
    }
  }

  test("v49: recall rows cover every query; n_hit/k bounded; packed " +
    "Hamming equals the unpacked sign-bit distance on a sample") {
    val out = Queries.v49BinaryRecall(spark, sf).collect()
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id".cast("long"),
        graft.functions.VectorFunctions.quantize($"embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val nQ = vecs.keys.count(_ % 100 == 0)
    assert(out.length == nQ)
    out.foreach { r =>
      val hit = r.getAs[Long]("n_hit")
      assert(hit >= 0 && hit <= 5)
      assert(r.getAs[Double]("recall_at_5") == hit.toDouble / 5)
    }
    // packed-code Hamming == unpacked sign disagreement count
    def pack(v: Array[Long]): Long =
      v.zipWithIndex.foldLeft(0L) { case (acc, (x, i)) =>
        if (x >= 0) acc | (1L << i) else acc }
    val ids = vecs.keys.toSeq.sorted.take(20)
    for (a <- ids; b <- ids) {
      val unpacked = vecs(a).zip(vecs(b))
        .count { case (x, y) => (x >= 0) != (y >= 0) }
      assert(java.lang.Long.bitCount(pack(vecs(a)) ^ pack(vecs(b))) ==
        unpacked)
    }
  }

  test("t23: gini = 1 - sum(c^2)/N^2 replays in BigInt per source; " +
    "bounded in [0, 1)") {
    val out = Queries.t23TermGini(spark, sf).collect()
    val bySource = spark.read.parquet(s"$sf/documents.parquet")
      .select($"source", $"text").collect()
      .filter(_.getString(1) != null)
      .groupBy(_.getString(0))
    assert(out.length == bySource.size)
    out.foreach { r =>
      val toks = bySource(r.getAs[String]("source"))
        .flatMap(_.getString(1).split(" ", -1))
      val counts = toks.groupBy(identity).map(_._2.length.toLong)
      val n = BigInt(toks.length)
      val sq = counts.map(c => BigInt(c) * c).sum
      assert(r.getAs[Long]("n_tokens") == toks.length)
      assert(r.getAs[Long]("n_types") == counts.size)
      assert(r.getAs[Long]("sum_sq") == sq.toLong)
      val gini = (n * n - sq).toDouble / (n * n).toDouble
      assert(r.getAs[Double]("gini") == gini)
      assert(gini >= 0.0 && gini < 1.0)
    }
  }

  test("e24: type counts partition events; an n=1 user can never " +
    "flag; outlier share consistent") {
    val out = Queries.e24ValueOutliers(spark, sf).collect()
    val ev = graft.sources.Tables.events(spark, sf)
    assert(out.map(_.getAs[Long]("n_events")).sum == ev.count())
    out.foreach { r =>
      assert(r.getAs[Long]("n_outliers") <= r.getAs[Long]("n_events"))
      assert(r.getAs[Double]("outlier_share") ==
        r.getAs[Long]("n_outliers").toDouble / r.getAs[Long]("n_events"))
    }
    // replay the exact 3-sigma test in BigInt over the raw events
    val rows = ev.select($"user_id".cast("long"), $"event_type",
      round($"value" * 100).cast("long")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = rows.groupBy(_._1).map { case (u, xs) =>
      val vs = xs.map(x => BigInt(x._3))
      u -> (BigInt(vs.length), vs.sum, vs.map(v => v * v).sum)
    }
    val expect = rows.groupBy(_._2).map { case (t, xs) =>
      t -> xs.count { case (u, _, v) =>
        val (n, sv, sv2) = byUser(u)
        val lhs = (BigInt(v) * n - sv)
        lhs * lhs * (n - 1) > 9 * n * (n * sv2 - sv * sv)
      }.toLong
    }
    out.foreach { r =>
      assert(r.getAs[Long]("n_outliers") ==
        expect(r.getAs[String]("event_type")))
    }
  }

  test("v50: recall is monotone non-decreasing in k on this corpus's " +
    "curve shape; totals are k x Q; hits bounded") {
    val out = Queries.v50RecallCurve(spark, sf).collect()
      .sortBy(_.getAs[Long]("k"))
    assert(out.map(_.getAs[Long]("k")).toSeq == Seq(1L, 3L, 5L))
    val nQ = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter($"vec_id" % 100 === 0).count()
    out.foreach { r =>
      assert(r.getAs[Long]("n_total") == r.getAs[Long]("k") * nQ)
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_total"))
      assert(r.getAs[Double]("recall") ==
        r.getAs[Long]("n_hit").toDouble / r.getAs[Long]("n_total"))
    }
    // n_hit itself can only grow with k (hit sets are nested)
    val hits = out.map(_.getAs[Long]("n_hit"))
    assert(hits.sliding(2).forall(w => w(0) <= w(1)))
  }

  test("t24: jaccard replays exactly from distinct vocab sets; " +
    "symmetric pairs appear once with src_a < src_b") {
    val out = Queries.t24VocabOverlap(spark, sf).collect()
    val vocab = spark.read.parquet(s"$sf/documents.parquet")
      .select($"source", $"text").collect()
      .filter(_.getString(1) != null)
      .groupBy(_.getString(0))
      .map { case (src, rs) =>
        src -> rs.flatMap(_.getString(1).split(" ", -1)).toSet }
    out.foreach { r =>
      val a = r.getAs[String]("src_a"); val b = r.getAs[String]("src_b")
      assert(a < b)
      val inter = (vocab(a) & vocab(b)).size.toLong
      assert(r.getAs[Long]("n_inter") == inter)
      assert(r.getAs[Long]("nv_a") == vocab(a).size.toLong)
      assert(r.getAs[Long]("nv_b") == vocab(b).size.toLong)
      assert(r.getAs[Double]("jaccard") ==
        inter.toDouble / (vocab(a).size + vocab(b).size - inter))
    }
  }

  test("e25: every active week reports; prev_wau chains to the prior " +
    "row; growth consistent") {
    val out = Queries.e25WowTrend(spark, sf).collect()
      .sortBy(_.getAs[Long]("week_epoch"))
    assert(out.nonEmpty)
    assert(out.head.getAs[Long]("prev_wau") == 0)
    assert(out.head.getAs[Double]("wow_growth") == 0.0)
    out.sliding(2).foreach { w =>
      if (w.length == 2) {
        assert(w(1).getAs[Long]("prev_wau") == w(0).getAs[Long]("wau"))
        assert(w(1).getAs[Double]("wow_growth") ==
          (w(1).getAs[Long]("wau") - w(0).getAs[Long]("wau")).toDouble /
            w(0).getAs[Long]("wau"))
      }
    }
  }

  test("v51: one row per subspace; totals equal the corpus; used " +
    "codes within ksub; imbalance >= 1") {
    val out = Queries.v51PqCodeBalance(spark, sf).collect()
    assert(out.length == 8)
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    out.foreach { r =>
      assert(r.getAs[Long]("n_used") >= 1 && r.getAs[Long]("n_used") <= 16)
      assert(r.getAs[Long]("max_n") >= r.getAs[Long]("min_n"))
      // Cauchy-Schwarz: ksub * sum(n^2) >= (sum n)^2
      assert(r.getAs[Double]("imbalance") >= 1.0 - 1e-12)
    }
  }

  test("p6: allocations sum to exactly the 1M cap; every extra is " +
    "0/1; quotas replay via Hamilton's method") {
    val out = Queries.p6TokenBudget(spark, sf).collect()
    assert(out.map(_.getAs[Long]("alloc")).sum == 1000000L)
    assert(out.forall(r => r.getAs[Long]("extra") == 0L ||
      r.getAs[Long]("extra") == 1L))
    val tokens = out.map(r =>
      r.getAs[String]("source") -> r.getAs[Long]("n_tokens")).toMap
    val tot = tokens.values.sum
    val base = tokens.map { case (s, t) => s -> (1000000L * t) / tot }
    val rem = tokens.map { case (s, t) => s -> (1000000L * t) % tot }
    val k = 1000000L - base.values.sum
    val winners = rem.toSeq.sortBy { case (s, r) => (-r, s) }
      .take(k.toInt).map(_._1).toSet
    out.foreach { r =>
      val s = r.getAs[String]("source")
      assert(r.getAs[Long]("base") == base(s))
      assert(r.getAs[Long]("extra") == (if (winners(s)) 1L else 0L))
      assert(r.getAs[Long]("alloc") == base(s) + (if (winners(s)) 1 else 0))
    }
  }

  test("e23: segments partition the user population; quartile labels " +
    "stay in 1..4; monetary total is the exact purchase sum") {
    val out = Queries.e23Rfm(spark, sf).collect()
    val ev = graft.sources.Tables.events(spark, sf)
    val nUsers = ev.select($"user_id").distinct().count()
    assert(out.map(_.getAs[Long]("n_users")).sum == nUsers)
    Seq("r_q", "f_q", "m_q").foreach { c =>
      assert(out.forall(r => {
        val v = r.getAs[Long](c); v >= 1 && v <= 4
      }))
    }
    val totCents = ev.filter($"event_type" === "purchase")
      .select(sum(round($"value" * 100).cast("long")))
      .as[Long].collect().head
    val got = out.map(_.getAs[Double]("total_monetary")).sum
    assert(math.abs(got - totCents / 100.0) < 1e-6)
  }
}
