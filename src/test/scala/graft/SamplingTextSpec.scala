package graft

import graft.functions.TextFunctions._
import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingTextSpec extends SparkSpec {
  import spark.implicits._

  test("perClassSample caps per class and is deterministic") {
    val df = (0L until 100L).map(i => (i, (i % 3).toString)).toDF("id", "cls")
    val s1 = Sampling.perClassSample(df, "cls", "id", 5)
    assert(s1.groupBy("cls").count().as[(String, Long)].collect()
      .forall(_._2 == 5))
    val ids1 = s1.select("id").as[Long].collect().sorted.toSeq
    val ids2 = Sampling.perClassSample(df, "cls", "id", 5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids1 === ids2)
  }

  test("hashSplit is deterministic and ~20% val") {
    val df = (0L until 1000L).toDF("id")
    val counts = Sampling.hashSplit(df, "id")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts("val") > 100 && counts("val") < 300)
    assert(counts("train") + counts("val") === 1000)
  }

  test("shingles: short docs yield empty, order preserved") {
    val df = Seq((1L, "a b"), (2L, "a b c d")).toDF("id", "t")
    val r = df.select($"id", shingles($"t", 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(r(1L) === Seq.empty)
    assert(r(2L) === Seq("a b c", "b c d"))
  }

  test("stopword ratio and langId") {
    val df = Seq((1L, "the cat sat on the mat"), (2L, "foo bar baz qux"))
      .toDF("id", "t")
    val m = df.select($"id", stopwordRatio($"t"), langId($"t"))
      .as[(Long, Double, String)].collect()
    val byId = m.map(x => x._1 -> ((x._2, x._3))).toMap
    assert(byId(1L)._1 === 3.0 / 6.0)            // the, on, the
    assert(byId(1L)._2 === "en")
    assert(byId(2L)._1 === 0.0)
    assert(byId(2L)._2 === "other")
  }

  test("quality score formula") {
    val df = Seq((1L, Seq.fill(200)("word").mkString(" "))).toDF("id", "t")
    val r = df.select(qualityScore($"t")).as[Double].head()
    assert(r === 0.6)                            // no stopwords, length term capped
  }

  test("token counts: regex tokens split on punctuation") {
    val df = Seq((1L, "spark-sql rocks 123 rocks")).toDF("id", "t")
    val r = df.select(
      size(tokens($"t")).as("ws"),
      regexTokenCount($"t").as("re"),
      size(distinctTokens($"t")).as("d"))
      .as[(Int, Int, Int)].head()
    assert(r === ((4, 5, 3)))                    // "spark-sql" → spark,sql; "rocks" ×2
  }

  test("winnowing: docs sharing a >= w+n-1 token run share a fingerprint") {
    // n=3, w=4 → any shared 6-token run guarantees a common local-min
    val shared = "one two three four five six"
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"zz yy xx $shared ww"),
      (3L, "totally different words with no overlap at all here")
    ).toDF("id", "t")
    val fps = docs
      .select($"id", positionalShingleHashes($"t", 3).as("hs"))
      .select($"id", windowMins($"hs", 4).as("fp"))
      .as[(Long, Seq[String])].collect().toMap
    assert(fps(1L).toSet.intersect(fps(2L).toSet).nonEmpty)
    assert(fps(1L).toSet.intersect(fps(3L).toSet).isEmpty)
    // too short for any full window → empty fingerprint set
    val short = Seq((9L, "a b c d")).toDF("id", "t")
      .select(windowMins(positionalShingleHashes($"t", 3), 4))
      .as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("simhash64 emits 64-char bitstring; fingerprint stable") {
    val df = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("id", "t")
    val s = df.select(simhash64($"t")).as[String].head()
    assert(s.length === 64 && s.forall(c => c == '0' || c == '1'))
    val f1 = df.select(minShingleFingerprint($"t")).as[String].head()
    val f2 = df.select(minShingleFingerprint($"t")).as[String].head()
    assert(f1 === f2 && f1.length === 32)
  }

  test("simhash64 of NULL text is the 64-char zero string, not empty") {
    val df = Seq((1L, Option.empty[String]), (2L, Option("")))
      .toDF("id", "t")
    val fps = df.select($"id", simhash64($"t").as("fp"))
      .orderBy("id").as[(Long, String)].collect()
    assert(fps(0)._2 === "0" * 64) // NULL text → empty token set → all-zero votes
    assert(fps(1)._2.length === 64) // empty string still hashes its one "" token
  }
}
