package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "s1"),
    (2L, "the quick brown fox jumps over the lazy dog", "s1"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat", "s1"),   // near dup of 1
    (4L, "completely different text with unrelated words here", "s1"),
    (5L, "another unrelated document about spark engines", "s2")
  ).toDF("doc_id", "text", "source")

  test("exact dedup keeps min id per text group") {
    val r = Dedup.exact(docs, "doc_id", "text")
      .select("keep_id", "n").as[(Long, Long)].collect().toSet
    assert(r === Set((1L, 2L), (3L, 1L), (4L, 1L), (5L, 1L)))
  }

  test("incremental dedup drops already-seen content, keeps new") {
    val seen = Dedup.exact(docs.filter($"doc_id" <= 3), "doc_id", "text")
    val batch2 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog", "s1"), // seen
      (11L, "a genuinely new document arrives here", "s1"),
      (12L, "a genuinely new document arrives here", "s1")        // in-batch dup
    ).toDF("doc_id", "text", "source")
    val r = Dedup.incremental(batch2, "doc_id", "text", seen)
      .select("keep_id", "n").as[(Long, Long)].collect().toSet
    assert(r === Set((11L, 2L)))
  }

  test("minhash LSH finds exact and near duplicates, not unrelated docs") {
    val r = Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.5)
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect()
    val pairs = r.map(x => (x._1, x._2)).toSet
    assert(pairs.contains((1L, 2L)))             // identical → jaccard 1
    assert(r.find(x => (x._1, x._2) == ((1L, 2L))).get._3 === 1.0)
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("minhash LSH mega-bucket guard drops over-full buckets only") {
    // a boilerplate family: 5 identical docs — every band bucket they
    // occupy has size 5
    val boiler = (10L to 14L)
      .map(i => (i, "boilerplate footer repeated verbatim on every single page", "s1"))
      .toDF("doc_id", "text", "source")
    val all = docs.union(boiler)
    val guarded = Dedup.minhashLsh(all, "doc_id", "text", maxBucket = 4L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // the over-full family generates NO pairs; genuine near-dups in
    // small buckets are untouched
    assert(!guarded.exists(p => p._1 >= 10L || p._2 >= 10L))
    assert(guarded.contains((1L, 2L)) && guarded.contains((1L, 3L)))
    // with the slack operational cap the family's pairs come back
    val slack = Dedup.minhashLsh(all, "doc_id", "text")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(slack.contains((10L, 11L)) && slack.contains((13L, 14L)))
    assert(guarded.subsetOf(slack))
  }

  test("simhash: identical docs agree, fingerprint is 64 bits") {
    val r = Dedup.simhash(docs, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(r(1L) === r(2L))
    assert(r.values.forall(s => s.length == 64 && s.forall(c => c == '0' || c == '1')))
    assert(r(1L) !== r(4L))
  }

  test("simhash dup join: exact dups at distance 0, banding is complete") {
    val r = Dedup.simhashDup(docs, "doc_id", "text")
      .select("a_id", "b_id", "hamming").as[(Long, Long, Long)].collect()
    val m = r.map(x => (x._1, x._2) -> x._3).toMap
    assert(m((1L, 2L)) === 0L)                   // identical text
    // near-dup (1,3) differs by one token; assert parity with the
    // naive all-pairs ground truth computed from the fingerprints
    val fps = Dedup.simhash(docs, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    val naive = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      h = fa.zip(fb).count { case (x, y) => x != y } if h <= 3
    } yield (a, b) -> h.toLong).toMap
    assert(m === naive)
  }

  test("simhash mega-bucket guard drops over-full band buckets only") {
    // 6 identical copies: every band bucket they occupy has size >= 6
    val boiler = (10L to 15L)
      .map(i => (i, "boilerplate footer repeated verbatim on every single page", "s1"))
      .toDF("doc_id", "text", "source")
    val all = docs.union(boiler)
    val guarded = Dedup.simhashDup(all, "doc_id", "text", maxBucket = 5L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(!guarded.exists(p => p._1 >= 10L || p._2 >= 10L))
    assert(guarded.contains((1L, 2L)))
    val slack = Dedup.simhashDup(all, "doc_id", "text")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(slack.contains((10L, 11L)) && slack.contains((14L, 15L)))
    assert(guarded.subsetOf(slack))
  }

  test("simhash spanning edges yield the same components as all pairs") {
    val boiler = (10L to 15L)
      .map(i => (i, "boilerplate footer repeated verbatim on every single page", "s1"))
      .toDF("doc_id", "text", "source")
    val all = docs.union(boiler)
    def components(edges: Set[(Long, Long)]): Map[Long, Long] = {
      val ids = all.select($"doc_id").as[Long].collect()
      val root = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
      def find(x: Long): Long =
        if (root(x) == x) x else { root(x) = find(root(x)); root(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) root(math.max(ra, rb)) = math.min(ra, rb)
      }
      ids.map(i => i -> find(i)).toMap
    }
    val pairComp = components(
      Dedup.simhashDup(all, "doc_id", "text")
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet)
    val edgeComp = components(
      Dedup.simhashDupEdges(all, "doc_id", "text")
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet)
    assert(edgeComp === pairComp)
    // and the contraction keeps the boilerplate family to O(k) edges:
    // 5 star edges for the 6 copies, not 15 pairs
    val edges = Dedup.simhashDupEdges(all, "doc_id", "text")
      .select("a_id", "b_id").as[(Long, Long)].collect()
    assert(edges.count(p => p._1 >= 10L && p._2 >= 10L) === 5)
  }

  test("ngram jaccard pairs respect blocking and threshold") {
    val r = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source",
      shingleN = 2, threshold = 0.3)
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect()
    val m = r.map(x => (x._1, x._2) -> x._3).toMap
    assert(m((1L, 2L)) === 1.0)
    // docs 1,3 share 6 of their 8-shingle union... verify exact value:
    // shingles(1)=8 distinct bigrams, shingles(3)=8, intersection=7 → 7/9
    assert(math.abs(m((1L, 3L)) - 7.0 / 9.0) < 1e-12)
    assert(!m.keySet.exists(p => p._1 == 5L || p._2 == 5L)) // different source/block
  }

  test("embedding near-dup finds duplicate vectors within a block") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(1.0f, 0.001f), 0),
      (3L, Array(0.0f, 1.0f), 0), (4L, Array(1.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val r = Dedup.embeddingNearDup(vecs, "vec_id", "embedding", "label", 0.99)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(r === Set((1L, 2L)))                  // 4 blocked away, 3 orthogonal
  }
}
