package graft

import java.nio.file.{Files, Paths}

import graft.queries.Queries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-13 gates: code-store compaction execution (v120/v121/v126).
  * The CompactionSpec contract applied to the three code-store
  * families: the rewrite must purge EXACTLY the over-threshold shards,
  * leave every other shard's files bit-identical, leave NO shard above
  * the v71 threshold (the invariant the v106-family serve hints
  * broadcast under), and change nothing a query can observe. */
class Round13OpsSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def listPartDirs(p: String): Map[String, Seq[String]] =
    Files.list(Paths.get(p)).iterator().asScala
      .filter(d => Files.isDirectory(d) &&
        d.getFileName.toString.startsWith("centroid_id="))
      .map(d => d.getFileName.toString ->
        Files.list(d).iterator().asScala.map(_.getFileName.toString)
          .toSeq.sorted)
      .toMap

  /** The shared rewrite assertions for one compacted code store:
    * `serve` must have been run (it builds both layouts). */
  private def assertCompacted(tag: String): Unit = {
    val (srcPath, cmpPath) = Queries.codeCompactionPaths(sf, tag)
    val src = spark.read.parquet(srcPath)
    val dst = spark.read.parquet(cmpPath)
    val dead = col("id") % 7 === 0

    // recompute the v71 rule on the SOURCE store: that set must be
    // exactly the purged one
    val flagged = src.groupBy(col("centroid_id").cast("long").as("cid"))
      .agg(count(lit(1)).as("n"),
        sum(when(dead, 1L).otherwise(0L)).as("nd"))
      .filter(col("nd") * 8 > col("n"))
      .select("cid").collect().map(_.getLong(0)).toSet
    val srcParts = listPartDirs(srcPath)
    assert(flagged.nonEmpty, s"$tag: fixture flagged no shard — the " +
      "purge path went untested")
    assert(flagged.size < srcParts.size, s"$tag: fixture flagged every " +
      "shard — the copy path went untested")

    val dstParts = listPartDirs(cmpPath)
    assert(srcParts.keySet == dstParts.keySet,
      s"$tag: compacted store lost or invented shards")

    // unflagged shards: same file names, bit-identical bytes
    val flaggedDirs = flagged.map(c => s"centroid_id=$c")
    (srcParts.keySet -- flaggedDirs).foreach { dir =>
      assert(srcParts(dir) == dstParts(dir),
        s"$tag/$dir: file set changed")
      srcParts(dir).foreach { f =>
        assert(Files.mismatch(Paths.get(srcPath, dir, f),
          Paths.get(cmpPath, dir, f)) == -1L,
          s"$tag/$dir/$f: bytes differ — unflagged shard was rewritten")
      }
    }

    // flagged shards: zero tombstoned rows, every live row kept
    val inFlagged = col("centroid_id").cast("long")
      .isin(flagged.toSeq: _*)
    assert(dst.filter(inFlagged && dead).count() == 0L,
      s"$tag: a flagged shard still holds tombstoned rows")
    val wantIds = src.filter(inFlagged && !dead)
      .select("id").collect().map(_.getLong(0)).toSet
    val gotIds = dst.filter(inFlagged)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(gotIds == wantIds, s"$tag: flagged-shard rewrite dropped " +
      "or invented live rows")

    // THE gated invariant: after the rewrite, NO shard of the
    // compacted store is above the v71 threshold — the bound the
    // maintenance serves' broadcast(tombstone) hints rely on
    val over = dst.groupBy(col("centroid_id").cast("long").as("cid"))
      .agg(count(lit(1)).as("n"),
        sum(when(dead, 1L).otherwise(0L)).as("nd"))
      .filter(col("nd") * 8 > col("n")).count()
    assert(over == 0L, s"$tag: $over shard(s) of the compacted store " +
      "still exceed the 12.5% threshold — the serve-time bound is " +
      "not enforced")
  }

  private def rows(df: DataFrame): Set[(Long, Long, Long, Double)] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
      .toSet

  test("v120: SQ8 compacted serve == v109 maintenance serve, and the " +
    "rewrite honors the CompactionSpec contract") {
    val got = rows(Queries.v120SqCompaction(spark, sf))
    val want = rows(Queries.v109SqMaintenance(spark, sf))
    assert(got == want)
    assert(got.nonEmpty)
    assertCompacted("sqcmp")
  }

  test("v121: IVFPQ compacted serve == v110 maintenance serve, and " +
    "the rewrite honors the CompactionSpec contract") {
    val got = rows(Queries.v121IvfpqCompaction(spark, sf))
    val want = rows(Queries.v110IvfpqMaintenance(spark, sf))
    assert(got == want)
    assert(got.nonEmpty)
    assertCompacted("ivfpqcmp")
  }

  test("v126: trained-PQ compacted serve == v106 maintenance serve, " +
    "and the rewrite honors the CompactionSpec contract") {
    val got = rows(Queries.v126PqCompaction(spark, sf))
    val want = rows(Queries.v106StoreMaintenance(spark, sf))
    assert(got == want)
    assert(got.nonEmpty)
    assertCompacted("pqcmp")
  }

  // ---------- v122/v127: multi-layer HNSW ----------

  private def pHash(id: Long): Long =
    ((id % 2147483647L) * 2654435761L) % 2147483647L

  test("v122: the geometric levels NEST (hash%25=0 implies hash%5=0), " +
    "both upper layers are non-empty, and the top entry is a valid " +
    "seed at every depth (fixture-level)") {
    val ids = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").cast("long")).collect()
      .map(_.getLong(0)).toSet
    val l1 = ids.filter(pHash(_) % 5 == 0)
    val l2 = ids.filter(pHash(_) % 25 == 0)
    assert(l2.nonEmpty && l1.nonEmpty)
    assert(l2.subsetOf(l1), "level nesting broken: an L2 node is " +
      "missing from L1 — its descent winner could not seed L1")
    assert(l1.subsetOf(ids))
    assert(l2.size < l1.size && l1.size < ids.size,
      "the geometric sampling did not thin between levels")
  }

  test("v122: an independent driver-side simulation of all nine steps " +
    "(L2 descent -> L1 descent -> ef=4 beam) reproduces the gated " +
    "frame exactly") {
    val (e0df, e1df, e2df) = Queries.multilayerEdges(spark, sf)
    def adj(df: org.apache.spark.sql.DataFrame): Map[Long, List[Long]] =
      df.select(col("src_id"), col("dst_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).toList) }
    val (e0, e1, e2) = (adj(e0df), adj(e1df), adj(e2df))
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").cast("long").as("id"),
        graft.functions.VectorFunctions.quantize(col("embedding"))
          .as("qv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toMap
    def d2(a: Array[Long], b: Array[Long]): BigInt =
      a.zip(b).map { case (x, y) => BigInt(x - y) * BigInt(x - y) }.sum
    val l2ids = vecs.keySet.filter(pHash(_) % 25 == 0)
    val entry = l2ids.min
    val queries = vecs.keySet.filter(_ % 100 == 0).toList.sorted
    val expected = queries.flatMap { qid =>
      val qv = vecs(qid)
      def descend(start: Long, edges: Map[Long, List[Long]]): Long = {
        var cur = start
        for (_ <- 1 to 3) {
          val cand = Set(cur) ++ edges.getOrElse(cur, Nil)
          cur = cand.toList.map(n => (d2(vecs(n), qv), n))
            .sortBy(identity).head._2
        }
        cur
      }
      val seed = descend(descend(entry, e2), e1)
      var frontier = Set(seed)
      var ranked: List[(Long, Long)] = Nil
      for (_ <- 1 to 3) {
        val cand = frontier ++ frontier.flatMap(n => e0.getOrElse(n, Nil))
        ranked = cand.toList.map(n => (d2(vecs(n), qv), n))
          .sortBy(identity).take(4).zipWithIndex
          .map { case ((_, n), i) => (i + 1L, n) }
        frontier = ranked.map(_._2).toSet
      }
      ranked.map { case (rnk, nid) => (qid, rnk, nid) }
    }.toSet
    val got = Queries.v122HnswMultilayer(spark, sf)
      .select(col("query_id"), col("rnk"), col("node_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty && got === expected)
  }

  test("v127: the recall row recomputes from the gated v122 frame " +
    "and v1's exact scan") {
    val beam = Queries.v122HnswMultilayer(spark, sf)
      .select(col("query_id"), col("rnk"), col("node_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exact = Queries.v1KnnL2(spark, sf)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val byQ = beam.groupBy(_._1)
    val want = byQ.map { case (q, rs) =>
      val hits = rs.count(r => exact.contains((q, r._3))).toLong
      val top = rs.minBy(_._2)
      (q, top._3, if (exact.contains((q, top._3))) 1L else 0L, hits)
    }.toSet
    val got = Queries.v127HnswmlRecall(spark, sf)
      .select(col("query_id"), col("node_id"), col("in_top5"),
        col("frontier_hits")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got.nonEmpty && got === want)
  }

  // ---------- v123: staged re-encode after warm coarse retrain ----------

  test("v123: the re-encode set IS the drift set, unmigrated rows keep " +
    "their stored code bytes verbatim, and migrated rows equal a cold " +
    "re-encode under the refreshed centroids") {
    val (codes4, tc5, mixed, migIds, book, g) =
      Queries.retrainedIvfpqState(spark, sf)
    def cmap(df: DataFrame): Map[Long, (Seq[Int], Long)] =
      df.select(col("id").cast("long"), col("codes"),
          col("centroid_id").cast("long")).collect()
        .map(r => (r.getLong(0), (r.getSeq[Int](1), r.getLong(2)))).toMap
    val old = cmap(codes4)
    val mix = cmap(mixed)
    val mig = migIds.select(col("id").cast("long")).collect()
      .map(_.getLong(0)).toSet
    assert(mix.keySet === old.keySet, "retrain changed store membership")
    // the staging is real at this fixture: some rows migrate, most
    // keep their bytes (fixture-level expectation)
    assert(mig.nonEmpty && mig.size < old.size)
    // cold full re-encode under tc5 with the SAME fixed codebook
    val cold = cmap(graft.operators.IvfPq.encodeResidual(g, tc5,
      "id", "qemb", "cid", 64, 8, book, scale = 1))
    // the re-encode work list is exactly the assignment-drift set,
    // derived independently from the cold assignment vs the store
    assert(mig === old.keySet.filter(id => cold(id)._2 != old(id)._2),
      "the migrated set is not the drift set")
    mix.foreach { case (id, row) =>
      if (mig(id))
        assert(row === cold(id), s"migrated $id != cold re-encode")
      else
        assert(row === old(id), s"unmigrated $id code bytes changed")
    }
  }

  // ---------- v124/v128: deterministic k-means++ ----------

  test("v124: an independent replay of the inverse-CDF selection " +
    "(nearest-seed D² recomputed from scratch each round) reproduces " +
    "the gated trace, and the D² mass strictly decreases") {
    import graft.operators.Sampling
    val sample = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").cast("long").as("id"),
        graft.functions.VectorFunctions.quantize(col("embedding"))
          .as("qv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy { case (id, _) => (pHash(id), id) }
      .take(Sampling.KppSampleSize)
    val n = sample.length
    def d2(a: Array[Long], b: Array[Long]): BigInt =
      a.zip(b).map { case (x, y) => BigInt(x - y) * BigInt(x - y) }.sum
    val two31 = BigInt(2147483648L)
    var sel = List(sample(
      ((BigInt(n) * Sampling.kppThreshold(0)) / two31).toInt)._1)
    var trace = List((1L, sel.head, 0L))
    for (r <- 1 to 9) {
      // from-scratch min over ALL selected seeds (the gate updates
      // incrementally — the replay must not share that shortcut)
      val selVecs = sel.map(id => sample.find(_._1 == id).get._2)
      val dmin = sample.map(p => selVecs.map(sv => d2(p._2, sv)).min)
      val t = dmin.sum
      val ar = BigInt(Sampling.kppThreshold(r))
      val cums = dmin.scanLeft(BigInt(0))(_ + _).tail
      val idx = cums.indexWhere(c => c * two31 > t * ar)
      sel = sel :+ sample(idx)._1
      trace = trace :+ (((r + 1).toLong, sample(idx)._1, t.toLong))
    }
    val got = Queries.v124KmeansppSeeds(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toList
    assert(got === trace)
    assert(got.map(_._2).distinct.size == 10, "seeds not distinct")
    val masses = got.map(_._3).drop(1)
    assert(masses.zip(masses.tail).forall { case (a, b) => b < a },
      "D² mass did not strictly decrease across rounds")
  }

  test("v128: the ++-seeded trained serve returns 5 ranked rows per " +
    "query with non-decreasing distances") {
    val rows = Queries.v128KmeansppTrain(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.length == 5, s"query $q returned ${rs.length} rows")
      val byRnk = rs.sortBy(_._2).map(_._3)
      assert(byRnk.zip(byRnk.tail).forall { case (a, b) => a <= b },
        s"query $q distances not monotone in rank")
    }
  }

  // ---------- v125/v129: Gram-driven greedy OPQ allocation ----------

  test("v125: every step of the gated allocation is the exact greedy " +
    "argmin-load choice over eligible subspaces, from independently " +
    "recomputed variance numerators") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(graft.functions.VectorFunctions.quantize(col("embedding"))
        .as("qv"))
      .collect().map(_.getSeq[Long](0).toArray)
    val n = BigInt(vecs.length)
    val nums = (0 until 64).map { d =>
      val sx = vecs.foldLeft(BigInt(0))((a, v) => a + BigInt(v(d)))
      val sx2 = vecs.foldLeft(BigInt(0))((a, v) =>
        a + BigInt(v(d)) * BigInt(v(d)))
      d -> (n * sx2 - sx * sx)
    }.toMap
    val got = Queries.v125OpqAlloc(spark, sf).collect()
      .map(r => (r.getLong(0).toInt,
        (r.getLong(1).toInt, r.getLong(2).toInt, r.getDouble(3)))).toMap
    assert(got.keySet === (0 until 64).toSet)
    got.foreach { case (d, (_, _, vn)) => assert(vn == nums(d).toDouble) }
    // replay: walk the gated allocation in rank order and check each
    // pick was the least-loaded eligible subspace at that moment
    val ranked = (0 until 64).sortBy(d => (-nums(d), d))
    val sums = Array.fill(8)(BigInt(0)); val cnts = Array.fill(8)(0)
    ranked.foreach { d =>
      val (sub, slot, _) = got(d)
      val best = (0 until 8).filter(cnts(_) < 8)
        .minBy(j => (sums(j), j))
      assert(sub == best,
        s"dim $d went to $sub but the greedy argmin-load was $best")
      assert(slot == cnts(sub), s"dim $d slot ${slot} != ${cnts(sub)}")
      sums(sub) += nums(d); cnts(sub) += 1
    }
    assert(cnts.forall(_ == 8), "a subspace missed its capacity")
  }

  test("v129: the recall row recomputes from the greedy-permutation " +
    "ADC serve and v1's exact scan") {
    val approx = Queries.opqAllocSearch(spark, sf)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val exact = Queries.v1KnnL2(spark, sf)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val aSet = approx.toSet
    val want = exact.groupBy(_._1).map { case (q, rs) =>
      q -> rs.count(aSet.contains).toLong
    }
    val got = Queries.v129OpqAllocRecall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.nonEmpty && got === want)
  }

  test("flat code stores compact on v71's shards: the executed flag " +
    "set IS the planner's decision") {
    // builds are idempotent (ensurePersisted); the serve tests above
    // may or may not have run yet, so force the build here
    Queries.v120SqCompaction(spark, sf).collect()
    val (srcPath, _) = Queries.codeCompactionPaths(sf, "sqcmp")
    val got = spark.read.parquet(srcPath)
      .groupBy(col("centroid_id").cast("long").as("cid"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("id") % 7 === 0, 1L).otherwise(0L)).as("nd"))
      .filter(col("nd") * 8 > col("n"))
      .select("cid").collect().map(_.getLong(0)).toSet
    val want = Queries.v71CompactionReport(spark, sf)
      .filter(col("needs_compaction") === 1L)
      .select(col("centroid_id").cast("long")).collect()
      .map(_.getLong(0)).toSet
    assert(got == want,
      s"sq store flags $got but v71's planner decided $want")
  }
}
