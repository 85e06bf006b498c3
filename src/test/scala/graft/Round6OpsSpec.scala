package graft

import graft.queries.Queries

/** Invariant specs for the round-6 widening batch: PQ recall (v36),
  * IVF balance (v37), containment pairs (d17), source dup rate (p5),
  * source vocabulary (t17), user streaks (e18), part value share
  * (q27), priority class (q28), returned customers (q29), nation flow
  * (q30). Exact value parity is covered by the DuckDB oracle gate;
  * these assert the semantic properties the oracle can't name.
  */
class Round6OpsSpec extends SparkSpec {
  import spark.implicits._

  test("v36: recall is n_hit/5 in [0,1], one row per query") {
    val rows = Queries.v36PqRecall(spark, sf).collect()
    assert(rows.nonEmpty)
    val nQueries = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter($"vec_id" % 100 === 0).count()
    assert(rows.length == nQueries)
    rows.foreach { r =>
      val hit = r.getAs[Long]("n_hit")
      assert(hit >= 0 && hit <= 5)
      assert(r.getAs[Double]("recall_at_5") === hit / 5.0)
    }
  }

  test("v37: imbalance >= 1 (Cauchy-Schwarz) and totals reconcile") {
    val r = Queries.v37IvfBalance(spark, sf).collect().head
    val gallery = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(r.getAs[Long]("n_total") == gallery)
    assert(r.getAs[Long]("max_n") >= r.getAs[Long]("min_n"))
    // nlist * sum(n_i^2) >= (sum n_i)^2 with equality iff balanced
    assert(r.getAs[Double]("imbalance") >= 1.0 - 1e-12)
  }

  test("d17: containment >= jaccard on the shared candidate set, " +
    "inter bounded by the smaller shingle set") {
    val cont = Queries.d17Containment(spark, sf).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r).toMap
    assert(cont.nonEmpty)
    cont.values.foreach { r =>
      val c = r.getAs[Double]("containment")
      assert(c >= 0.5 && c <= 1.0)
      assert(r.getAs[Long]("inter") <=
        math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))
    }
    // every Jaccard-passing pair also passes containment (C >= J)
    Queries.d2MinhashPairs(spark, sf).collect().foreach { r =>
      val key = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
      assert(cont.contains(key))
      assert(cont(key).getAs[Double]("containment") >=
        r.getAs[Double]("jaccard") - 1e-12)
    }
  }

  test("p5: dup counts reconcile and rates are exact fractions") {
    val rows = Queries.p5SourceDupRate(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    rows.foreach { r =>
      val docs = r.getAs[Long]("n_docs"); val dups = r.getAs[Long]("n_dups")
      assert(dups == docs - r.getAs[Long]("n_distinct_texts"))
      assert(r.getAs[Double]("dup_rate") === dups.toDouble / docs)
    }
  }

  test("t17: hapax <= types <= tokens, token mass reconciles") {
    val rows = Queries.t17SourceVocab(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hapax") <= r.getAs[Long]("n_types"))
      assert(r.getAs[Long]("n_types") <= r.getAs[Long]("n_tokens"))
    }
    val totalToks = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("sum(size(split(text, ' ')))")
      .collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == totalToks)
  }

  test("e18: streaks partition the active days; user-0 replay agrees") {
    val rows = Queries.e18UserStreaks(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("max_streak") <= r.getAs[Long]("n_active_days"))
      assert(r.getAs[Long]("n_streaks") >= 1)
    }
    val days = graft.sources.Tables.events(spark, sf)
      .filter($"user_id" === 0)
      .selectExpr("(ts - pmod(ts, 86400000000000) ) div 86400000000000 AS day")
      .distinct().as[Long].collect().sorted
    var best = 1L; var cur = 1L
    days.sliding(2).foreach { w =>
      if (w.length == 2) {
        if (w(1) == w(0) + 1) { cur += 1; best = math.max(best, cur) }
        else cur = 1
      }
    }
    val r0 = rows.find(_.getAs[Long]("user_id") == 0L).get
    assert(r0.getAs[Long]("n_active_days") == days.length)
    assert(r0.getAs[Long]("max_streak") == best)
  }

  test("q27: kept parts each clear the exact threshold; shares < 1") {
    val rows = Queries.q27PartValueShare(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getAs[Double]("share")
      assert(share > 1.0 / 2000 - 1e-12 && share < 1.0)
    }
  }

  test("q28: high+low line counts cover the filtered fact rows") {
    val rows = Queries.q28PriorityClass(spark, sf).collect()
    val total = rows.map(r => r.getAs[Long]("high_line_count") +
      r.getAs[Long]("low_line_count")).sum
    val expected = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter("l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'")
      .count()
    assert(total == expected)
  }

  test("q29: exactly 20 rows, descending revenue") {
    val rows = Queries.q29ReturnedCustomers(spark, sf).collect()
    assert(rows.length == 20)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("v38: one row per seed centroid, shifts non-negative, " +
    "occupancy covers the gallery") {
    val rows = Queries.v38CentroidShift(spark, sf).collect()
    assert(rows.length == 10)
    val gallery = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.map(_.getAs[Long]("n")).sum == gallery)
    rows.foreach(r => assert(r.getAs[Double]("shift") >= 0.0))
  }

  test("e19: every reported user clears the threshold, and the " +
    "threshold is attained by some user") {
    val rows = Queries.e19PowerUsers(spark, sf).collect()
    assert(rows.nonEmpty)
    val thr = rows.head.getAs[Long]("thr")
    rows.foreach(r => assert(r.getAs[Long]("n_events") >= thr))
    assert(rows.exists(_.getAs[Long]("n_events") == thr) ||
      rows.forall(_.getAs[Long]("n_events") > thr))
  }

  test("q31: repeat counts bounded and rates exact") {
    val rows = Queries.q31RepeatCustomers(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Long]("n_customers"); val rep = r.getAs[Long]("n_repeat")
      assert(rep <= c)
      assert(r.getAs[Double]("repeat_rate") === rep.toDouble / c)
    }
  }

  test("t18: top-10 mass bounded by total incidences") {
    val rows = Queries.t18NgramCoverage(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val top = r.getAs[Long]("top_mass")
      val tot = r.getAs[Long]("n_incidences")
      assert(top <= tot && top > 0)
      assert(r.getAs[Double]("coverage") === top.toDouble / tot)
    }
  }

  test("v39: IVF recall bounded, one row per query") {
    val rows = Queries.v39IvfRecall(spark, sf).collect()
    val nQueries = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter($"vec_id" % 100 === 0).count()
    assert(rows.length == nQueries)
    rows.foreach { r =>
      val hit = r.getAs[Long]("n_hit")
      assert(hit >= 0 && hit <= 3)
      assert(r.getAs[Double]("recall_at_3") === hit / 3.0)
    }
  }

  test("v40: multi-probe candidates superset the single-bucket path — " +
    "per-query recall vs exact never drops") {
    def hitSet(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"))).toSet
    val exact = hitSet(Queries.v1KnnL2(spark, sf))
    val single = hitSet(Queries.v10LshSearch(spark, sf))
    val multi = hitSet(Queries.v40MultiprobeLsh(spark, sf))
    val queries = exact.map(_._1)
    queries.foreach { q =>
      val e = exact.filter(_._1 == q)
      val s1 = (single.filter(_._1 == q) & e).size
      val sm = (multi.filter(_._1 == q) & e).size
      assert(sm >= s1, s"query $q: multi-probe recall $sm < single $s1")
    }
    assert(multi.nonEmpty)
  }

  test("d18: cluster sizes partition the corpus") {
    val rows = Queries.d18ClusterSizes(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    rows.foreach(r => assert(r.getAs[Long]("n_docs") ==
      r.getAs[Long]("n_members") * r.getAs[Long]("n_clusters")))
  }

  test("m7: split rows partition the m6 manifest") {
    val rows = Queries.m7StratifiedSplit(spark, sf).collect()
    val manifest = Queries.m6PairManifest(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == manifest)
    assert(rows.map(_.getAs[String]("split")).toSet.subsetOf(
      Set("train", "val")))
    assert(rows.map(_.getAs[String]("modality")).toSet.subsetOf(
      Set("image", "audio", "video")))
  }

  test("q30: nation-pair revenue reconciles with the filtered total") {
    val rows = Queries.q30NationFlow(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => Set(1996L, 1997L)
      .contains(r.getAs[Long]("l_year"))))
    val sumCents = rows.map(r =>
      math.round(r.getAs[Double]("revenue") * 10000)).sum
    val expected = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter("l_shipdate >= '1996-01-01' AND l_shipdate < '1998-01-01'")
      .selectExpr(
        "sum(cast(round(l_extendedprice * (1 - l_discount) * 10000) as bigint))")
      .collect().head.getLong(0)
    assert(sumCents == expected)
  }
}
