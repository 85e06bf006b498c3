package graft

import graft.queries.Queries
import org.apache.spark.sql.functions._

/** Invariant specs for the round-4 widening batch: triplet mining
  * (v32), per-dim stats (v33), token chunking (t15), bigram LM (t16),
  * quota sampling (p4), pair manifest (m6), big orders (q23), promo
  * share (q24), supplier variety (q25), spike days (e16). Exact value
  * parity is covered by the DuckDB oracle gate; these assert the
  * semantic properties the oracle can't name.
  */
class Round4OpsSpec extends SparkSpec {
  import spark.implicits._

  test("v32: positive shares the anchor's label, negative doesn't, " +
    "and the positive is the true same-label minimum") {
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id".cast("long").as("id"), $"label".cast("long").as("lab"))
      .as[(Long, Long)].collect().toMap
    val rows = Queries.v32TripletMine(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id")
      val pos = r.getAs[Long]("pos_id"); val neg = r.getAs[Long]("neg_id")
      assert(pos != q)
      assert(labels(pos) == labels(q))
      assert(labels(neg) != labels(q))
    }
    // naive check on one anchor: pos_dist is the min same-label distance
    val q0 = rows.map(_.getAs[Long]("query_id")).min
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id".cast("long").as("id"),
        $"label".cast("long").as("lab"), $"embedding")
      .as[(Long, Long, Array[Float])].collect()
    val (qid, qlab, qv) = e.find(_._1 == q0).get
    def d2(a: Array[Float], b: Array[Float]): Long = {
      val qa = a.map(x => math.round(x * 10000.0))
      val qb = b.map(x => math.round(x * 10000.0))
      qa.zip(qb).map { case (x, y) => (x - y) * (x - y) }.sum
    }
    val want = e.filter(x => x._2 == qlab && x._1 != qid)
      .map(x => d2(qv, x._3)).min
    val got = rows.find(_.getAs[Long]("query_id") == q0).get
      .getAs[Double]("pos_dist")
    assert(math.abs(got - math.sqrt(want.toDouble) / 10000.0) < 1e-12)
  }

  test("v33: per-dim stats bound each other and match a naive recompute") {
    val rows = Queries.v33DimStats(spark, sf).collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_q") <= r.getAs[Long]("max_q"))
      assert(r.getAs[Double]("mean_q") >= r.getAs[Long]("min_q").toDouble)
      assert(r.getAs[Double]("mean_q") <= r.getAs[Long]("max_q").toDouble)
      assert(r.getAs[Double]("var_q") >= 0.0)
    }
    val xs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("embedding").as[Array[Float]].collect()
      .map(v => math.round(v(0) * 10000.0))
    val n = xs.length.toLong
    val mean = xs.sum.toDouble / n
    val d0 = rows.find(_.getAs[Long]("dim") == 0L).get
    assert(d0.getAs[Long]("n") == n)
    assert(math.abs(d0.getAs[Double]("mean_q") - mean) < 1e-9)
  }

  test("t15: chunks tile every document — stride starts, full coverage, " +
    "exact token conservation on the last chunk") {
    val r = Queries.t15Chunks(spark, sf)
    val perDoc = r.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        max($"tok_start" + $"n_chunk_toks").as("covered_end"),
        max("tok_start").as("last_start"))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id".cast("long").as("doc_id"),
        size(split($"text", " ")).cast("long").as("n_tok"))
    val joined = perDoc.join(docs, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { row =>
      val nTok = row.getAs[Long]("n_tok")
      assert(row.getAs[Long]("covered_end") == nTok)
      assert(row.getAs[Long]("last_start") < nTok)
      assert(row.getAs[Long]("n_chunks") == (nTok - 1) / 48 + 1)
    }
    // starts are stride multiples
    assert(r.filter(pmod($"tok_start", lit(48L)) =!= 0L).count() == 0L)
  }

  test("t16: head totals and the argmax agree with a naive recompute") {
    val r = Queries.t16BigramLm(spark, sf).collect()
    assert(r.nonEmpty)
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").as[String].collect()
    val counts = scala.collection.mutable.Map[(String, String), Long]()
    texts.foreach { t =>
      val toks = t.split(" ", -1)
      toks.sliding(2).foreach {
        case Array(a, b) =>
          counts((a, b)) = counts.getOrElse((a, b), 0L) + 1
        case _ =>
      }
    }
    val byHead = counts.groupBy(_._1._1)
    r.foreach { row =>
      val w1 = row.getAs[String]("w1")
      val naive = byHead(w1)
      assert(row.getAs[Long]("n_head") == naive.values.sum)
      assert(row.getAs[Long]("n_head") >= 10L)
      // argmax: highest count, ties to lexicographically last w2
      val best = naive.toSeq.map { case ((_, w2), n) => (n, w2) }.max
      assert(row.getAs[Long]("n_top") == best._1)
      assert(row.getAs[String]("top_next") == best._2)
      assert(row.getAs[Double]("p_top") <= 1.0)
    }
  }

  test("p4: thresholds bounded, kept mass within source mass, and the " +
    "rebalance pulls shares toward uniform") {
    val rows = Queries.p4QuotaSample(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("thr_bp") >= 1L && r.getAs[Long]("thr_bp") <= 10000L)
      assert(r.getAs[Long]("n_tokens_kept") <= r.getAs[Long]("src_tokens"))
    }
    // a source at/below its fair share keeps everything (thr = 10000)
    val full = rows.filter(_.getAs[Long]("thr_bp") == 10000L)
    full.foreach { r =>
      assert(r.getAs[Long]("n_tokens_kept") == r.getAs[Long]("src_tokens"))
    }
  }

  test("m6: every pair passes the gates and ids resolve in all sources") {
    val rows = Queries.m6PairManifest(spark, sf).collect()
    assert(rows.nonEmpty)
    val vecIds = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id".cast("long")).as[Long].collect().toSet
    rows.foreach { r =>
      assert(r.getAs[Double]("quality") >= 0.4)
      assert(r.getAs[Long]("n_tok") >= 10L)
      assert(vecIds.contains(r.getAs[Long]("pair_id")))
      assert(r.getAs[Double]("norm") >= 0.0)
    }
  }

  test("q23/q24/q25: rollup totals consistent with their fact scans") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val big = Queries.q23BigOrders(spark, sf).collect()
    big.foreach(r => assert(r.getAs[Long]("total_qty") > 300L))
    val naiveBig = li.groupBy("l_orderkey")
      .agg(sum($"l_quantity".cast("long")).as("q")).filter($"q" > 300)
      .count()
    assert(big.length.toLong == naiveBig)

    val promo = Queries.q24PromoShare(spark, sf).collect()
    promo.foreach { r =>
      val share = r.getAs[Double]("promo_share")
      assert(share >= 0.0 && share <= 1.0)
      assert(r.getAs[Double]("promo_revenue") <=
        r.getAs[Double]("total_revenue") + 1e-9)
    }

    val variety = Queries.q25SupplierVariety(spark, sf).collect()
    variety.foreach { r =>
      assert(r.getAs[Long]("n_suppliers") <= r.getAs[Long]("n_lines"))
      assert(r.getAs[Long]("n_parts") <= r.getAs[Long]("n_lines"))
    }
  }

  test("e16: prior-window sums recompute exactly from the daily counts") {
    val rows = Queries.e16SpikeDays(spark, sf)
      .orderBy("day_epoch").collect()
    assert(rows.nonEmpty)
    val days = rows.map(r => (r.getAs[Long]("day_epoch") / 86400,
      r.getAs[Long]("n"))).toMap
    rows.foreach { r =>
      val d = r.getAs[Long]("day_epoch") / 86400
      val prior = (d - 7 to d - 1).flatMap(days.get)
      assert(r.getAs[Long]("n_prior") == prior.length.toLong)
      assert(r.getAs[Long]("sum_prior") == prior.sum)
      val expectSpike = prior.nonEmpty &&
        r.getAs[Long]("n") * prior.length > 2 * prior.sum
      assert(r.getAs[Long]("is_spike") == (if (expectSpike) 1L else 0L))
    }
  }
}
