package graft

import graft.queries.Queries
import org.apache.spark.sql.functions._

/** Invariant specs for the round-3 operator additions: repetition
  * signals (t9), JSON props extraction (e7), moving-average window
  * (q11), incremental dedup (d9), two-stage re-rank (v16), SQ8 search
  * (v17). Exact value parity is covered by the DuckDB oracle gate;
  * these assert the semantic properties the oracle can't name.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("t9: fractions bounded, modal count matches a hand count") {
    val r = Queries.t9Repetition(spark, sf)
    val rows = r.collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val n = row.getAs[Long]("n_tokens")
      assert(row.getAs[Long]("n_distinct") <= n)
      assert(row.getAs[Long]("top_token_n") >= 1L)
      assert(row.getAs[Double]("top_token_frac") <= 1.0)
      assert(row.getAs[Double]("distinct_frac") <= 1.0)
      assert(row.getAs[Double]("top_bigram_frac") <= 1.0)
    }
    // hand-count the modal token of doc 0 and compare
    val text = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"doc_id" === 0).select("text").as[String].head()
    // split with limit -1: keep trailing empty tokens, matching Spark's
    // split() semantics the query uses
    val expected = text.split(" ", -1).groupBy(identity).values.map(_.length).max
    val got = r.filter($"doc_id" === 0).select("top_token_n").as[Long].head()
    assert(got === expected.toLong)
  }

  test("e7: bucket counts total the events table") {
    val r = Queries.e7JsonProps(spark, sf)
    val total = r.agg(sum("n")).as[Long].head()
    val events = spark.read.parquet(s"$sf/events.parquet").count()
    assert(total === events)
    // every bucket's sum_k sits inside the bucket's value range
    r.collect().foreach { row =>
      val b = row.getAs[Long]("k_bucket"); val n = row.getAs[Long]("n")
      val s = row.getAs[Long]("sum_k")
      assert(s >= b * 10 * n && s <= (b * 10 + 9) * n)
    }
  }

  test("q11: ma7 equals revenue on day one and stays within daily range") {
    val r = Queries.q11MovingAvg(spark, sf).orderBy("day").collect()
    assert(r.nonEmpty)
    assert(math.abs(r.head.getAs[Double]("ma7") -
      r.head.getAs[Double]("revenue")) < 1e-9)
    val revs = r.map(_.getAs[Double]("revenue"))
    r.foreach { row =>
      assert(row.getAs[Double]("ma7") >= revs.min - 1e-9)
      assert(row.getAs[Double]("ma7") <= revs.max + 1e-9)
    }
  }

  test("d9: survivors are batch docs whose hash is unseen") {
    val r = Queries.d9IncrementalDedup(spark, sf)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val seenHashes = docs.filter($"doc_id" % 4 =!= 0)
      .select(md5($"text")).as[String].collect().toSet
    val out = r.collect()
    assert(out.nonEmpty)
    out.foreach { row =>
      assert(row.getAs[Long]("keep_id") % 4 === 0L)
      assert(!seenHashes.contains(row.getAs[String]("text_hash")))
    }
  }

  test("v16: re-ranked dists are ascending and lower-bounded by exact knn") {
    val exact = Queries.v1KnnL2(spark, sf)
      .select($"query_id", $"rnk", $"dist".as("exact_dist"))
    val rr = Queries.v16Rerank(spark, sf)
    // ANN property: at each rank the re-ranked candidate can't beat the
    // exact kth neighbor; equality iff the shortlist contained it
    val joined = rr.join(exact, Seq("query_id", "rnk")).collect()
    assert(joined.nonEmpty)
    joined.foreach { row =>
      assert(row.getAs[Double]("dist") >= row.getAs[Double]("exact_dist") - 1e-9)
    }
    // per-query dists ascend with rank
    rr.collect().groupBy(_.getAs[Long]("query_id")).values.foreach { g =>
      val byRank = g.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("dist"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
    }
  }

  test("m3: shard manifests conserve bytes and assets per source") {
    val r = Queries.m3ShardAssign(spark, sf)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val total = docs.select(sum(octet_length($"text"))).as[Long].head()
    assert(r.agg(sum("shard_bytes")).as[Long].head() === total)
    assert(r.agg(sum("n_assets")).as[Long].head() === docs.count())
    r.collect().foreach { row =>
      assert(row.getAs[Long]("first_asset") <= row.getAs[Long]("last_asset"))
      assert(row.getAs[Long]("n_assets") >= 1L)
    }
  }

  test("q12: shares are probabilities and revenue is positive") {
    val r = Queries.q12MarketShare(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val sh = row.getAs[Double]("share")
      assert(sh >= 0.0 && sh <= 1.0)
      assert(row.getAs[Double]("total_revenue") > 0.0)
    }
  }

  test("v18: lloyd round conserves mass and reduces or keeps distortion") {
    val r = Queries.v18LloydRound(spark, sf).collect()
    val gallery = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(r.map(_.getAs[Long]("n_after")).sum === gallery)
    r.foreach { row =>
      assert(row.getAs[Long]("n_stayed") <= row.getAs[Long]("n_after"))
    }
    // a Lloyd step against exact means keeps most members in place
    assert(r.map(_.getAs[Long]("n_stayed")).sum * 2 > gallery)
  }

  test("e8: pivot columns total the events table") {
    val r = Queries.e8EventPivot(spark, sf)
    val total = r.select(
      (sum("n_view") + sum("n_click") + sum("n_purchase") +
        sum("n_signup") + sum("n_error")).cast("long")).as[Long].head()
    assert(total === spark.read.parquet(s"$sf/events.parquet").count())
  }

  test("q13: quartiles partition each nation with near-equal sizes") {
    val r = Queries.q13BalanceQuartiles(spark, sf).collect()
    r.groupBy(_.getAs[String]("n_name")).values.foreach { g =>
      // ntile fills buckets 1..min(4, rows-in-nation)
      val total = g.map(_.getAs[Long]("n")).sum
      val expected = (1L to math.min(4L, total)).toSet
      assert(g.map(_.getAs[Long]("quartile")).toSet === expected)
      val sizes = g.map(_.getAs[Long]("n"))
      assert(sizes.max - sizes.min <= 1)
      // quartile 1 holds the top balances: mins never increase
      val byQ = g.sortBy(_.getAs[Long]("quartile"))
      byQ.sliding(2).foreach {
        case Array(hi, lo) =>
          assert(hi.getAs[Double]("min_bal") >= lo.getAs[Double]("max_bal"))
        case _ => () // single-quartile nation: nothing to compare
      }
    }
  }

  test("t10: confusion matrix row sums match per-lang doc counts") {
    val r = Queries.t10LangConfusion(spark, sf)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(r.agg(sum("n")).as[Long].head() === docs.count())
    val rowSums = r.groupBy("lang").agg(sum("n").as("n"))
      .as[(String, Long)].collect().toMap
    val gold = docs.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(rowSums === gold)
    assert(r.select("lang_pred").distinct().as[String].collect().toSet
      .subsetOf(Set("en", "other")))
  }

  test("d11: a copied passage links its documents; unrelated docs don't") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (1L, base),
      (2L, "one two three " + base + " four five six"),
      (3L, "completely different words entirely unrelated content here"))
      .toDF("doc_id", "text")
    // minShared=1: any shared run of >= w+n-1 = 6 tokens is GUARANTEED
    // to share a winnowing fingerprint (the local-min property)
    val pairs = graft.operators.Dedup
      .overlapPairs(docs, "doc_id", "text", minShared = 1).collect()
    assert(pairs.exists(r => r.getAs[Long]("a_id") == 1L &&
      r.getAs[Long]("b_id") == 2L))
    assert(!pairs.exists(r => r.getAs[Long]("a_id") == 3L ||
      r.getAs[Long]("b_id") == 3L))
  }

  test("compactness edge cases: singleton class 0.0, identical vectors 0.0") {
    val df = Seq(
      (1L, 0, Seq(0.5f, -0.25f, 1.0f)),
      (2L, 0, Seq(0.5f, -0.25f, 1.0f)),  // identical pair → dist 0
      (3L, 1, Seq(0.9f, 0.1f, -0.3f)))   // singleton class
      .toDF("vec_id", "label", "embedding")
    val got = graft.operators.Centroids
      .classCompactness(df, "label", "embedding")
      .collect().map(x => x.getAs[Long]("label_id") ->
        (x.getAs[Long]("n"), x.getAs[Double]("mean_sq_dist"))).toMap
    assert(got(0L) === ((2L, 0.0)))
    assert(got(1L) === ((1L, 0.0)))
  }

  test("sq8 encode survives a constant dimension (range guard)") {
    // dim 2 constant across the gallery → range 0 → guarded to 1,
    // all codes 0, distance contribution 0; no division error
    val df = Seq(
      (0L, Seq(1.0f, 0.7f)), (100L, Seq(0.2f, 0.7f)), (2L, Seq(0.4f, 0.7f)))
      .toDF("gid", "v")
    import graft.functions.VectorFunctions.quantize
    val g = df.select($"gid", quantize($"v").as("qv"))
    val stats = g.select(posexplode($"qv").as(Seq("i", "x")))
      .groupBy("i").agg(min("x").as("mn"), max("x").as("mx"))
      .orderBy("i").collect()
    assert(stats(1).getLong(1) === stats(1).getLong(2)) // constant dim
    // the gated query's encode path on the real table is oracle-checked;
    // here just prove the whole query runs on a degenerate gallery shape
    // via the public surface (self-match still holds)
    val out = graft.operators.KnnJoin.knnL2(g, g.filter($"gid" === 0L),
      "gid", "qv", "gid", k = 1, scale = 1).collect()
    assert(out.head.getAs[Long]("neighbor_id") === 0L)
  }

  test("d12: one verdict per d2 pair, sim bounded, zero dist iff equal text") {
    val d2 = Queries.d2MinhashPairs(spark, sf).count()
    val r = Queries.d12EditDistance(spark, sf).collect()
    assert(r.length.toLong === d2)
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id".cast("long"), $"text").as[(Long, String)]
      .collect().toMap
    r.foreach { row =>
      val sim = row.getAs[Double]("sim")
      assert(sim >= 0.0 && sim <= 1.0)
      val same = texts(row.getAs[Long]("a_id")) == texts(row.getAs[Long]("b_id"))
      assert((row.getAs[Long]("edit_dist") == 0L) === same)
    }
  }

  test("q15/q16: cube covers rollup rows; set ops partition the segment") {
    val cube = Queries.q15RevenueCube(spark, sf).collect()
      .map(r => (r.getAs[String]("nation"), r.getAs[Long]("yr"))).toSet
    val rollup = Queries.q9RevenueRollup(spark, sf).collect()
      .map(r => (r.getAs[String]("nation"), r.getAs[Long]("yr"))).toSet
    assert(rollup.subsetOf(cube)) // CUBE ⊇ ROLLUP grouping sets
    assert(cube.exists { case (n, y) => n == "ALL" && y != -1L }) // year marginals
    val ops = Queries.q16SegmentSetOps(spark, sf)
    val total = ops.count()
    val building = spark.read.parquet(s"$sf/customer.parquet")
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey").distinct().count()
    assert(total === building) // active + inactive partition the segment
    assert(ops.select("c_custkey").distinct().count() === total)
  }

  test("t11: normalization is idempotent and length never grows") {
    val r = Queries.t11Normalize(spark, sf)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id".cast("long"), length($"text").cast("long"))
      .as[(Long, Long)].collect().toMap
    r.collect().foreach { row =>
      assert(row.getAs[Long]("n_chars_norm") <=
        docs(row.getAs[Long]("doc_id")))
      assert(row.getAs[String]("norm_hash").length === 32)
    }
    // already-normal text (lowercase words + single spaces) is unchanged
    assert(r.filter($"unchanged" === 1L).count() > 0)
  }

  test("v17: sq8 self-match at rank 1 with zero code distance") {
    val r = Queries.v17Sq8Knn(spark, sf)
    val top1 = r.filter($"rnk" === 1).collect()
    assert(top1.nonEmpty)
    top1.foreach { row =>
      assert(row.getAs[Long]("query_id") === row.getAs[Long]("neighbor_id"))
      assert(row.getAs[Double]("dist") === 0.0)
    }
  }
}
