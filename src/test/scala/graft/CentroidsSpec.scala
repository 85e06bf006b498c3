package graft

import graft.operators.Centroids
import org.apache.spark.sql.functions._

class CentroidsSpec extends SparkSpec {
  import spark.implicits._

  // class 0 clusters near (1,0), class 1 near (0,1); unbalanced counts
  // exercise the n^2-scaled distance (mean of class 0 = (0.95, 0.05))
  private lazy val vecs = Seq(
    (1L, 0L, Array(1.0f, 0.0f)), (2L, 0L, Array(0.9f, 0.1f)),
    (3L, 1L, Array(0.0f, 1.0f)), (4L, 1L, Array(0.1f, 0.9f)),
    (5L, 1L, Array(0.0f, 0.8f))
  ).toDF("vec_id", "label", "embedding")

  test("classSums: exact per-class counts and element-wise sums") {
    val g = vecs.select(col("label").as("lab"),
      graft.functions.VectorFunctions.quantize(col("embedding")).as("qv"))
    val r = Centroids.classSums(g, "lab", "qv")
      .as[(Long, Long, Seq[Long])].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
    assert(r(0L) === ((2L, Seq(19000L, 1000L))))
    assert(r(1L) === ((3L, Seq(1000L, 27000L))))
  }

  test("classSums (native vecsum) matches the exploded groupBy form " +
    "on random data, across partial-merge boundaries") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map(i =>
      (i.toLong, (rnd.nextInt(5)).toLong,
        Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    // 8 partitions force map-side partials + merges through serialize
    val g = rows.toDF("vec_id", "label", "embedding").repartition(8)
      .select(col("label").as("lab"),
        graft.functions.VectorFunctions.quantize(col("embedding")).as("qv"))
    val native = Centroids.classSums(g, "lab", "qv")
      .as[(Long, Long, Seq[Long])].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
    val exploded = g
      .select(col("lab"), posexplode(col("qv")).as(Seq("i", "x")))
      .groupBy("lab", "i").agg(sum("x").as("sx"))
      .groupBy("lab")
      .agg(array_sort(collect_list(struct(col("i"), col("sx")))).as("p"),
        count(lit(1)).as("d"))
      .select(col("lab"), transform(col("p"), q => q.getField("sx")).as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    val counts = g.groupBy("lab").count()
      .as[(Long, Long)].collect().toMap
    assert(native.keySet == exploded.keySet)
    native.foreach { case (lab, (n, svec)) =>
      assert(n == counts(lab))
      assert(svec == exploded(lab))
    }
  }

  test("classSums skips NULL vectors; an all-NULL class drops") {
    val g = Seq((0L, Some(Seq(1L, 2L))), (0L, None),
        (1L, None))
      .toDF("lab", "qv")
    val r = Centroids.classSums(g, "lab", "qv")
      .as[(Long, Long, Seq[Long])].collect()
    assert(r.toSeq == Seq((0L, 2L, Seq(1L, 2L))))
  }

  test("nearestClassMean assigns the geometrically nearest mean") {
    val queries = Seq(
      (10L, 0L, Array(0.8f, 0.2f)),   // near class-0 mean
      (11L, 1L, Array(0.2f, 0.8f)),   // near class-1 mean
      (12L, 0L, Array(0.1f, 0.9f))    // labeled 0 but nearest class 1
    ).toDF("vec_id", "label", "embedding")
    val r = Centroids.nearestClassMean(vecs, "vec_id", "label",
        "embedding", queries)
      .select("query_id", "pred_label", "correct")
      .as[(Long, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
    assert(r === Map(10L -> ((0L, 1L)), 11L -> ((1L, 1L)),
      12L -> ((1L, 0L))))
  }

  test("distance matches the naive float mean within fp tolerance") {
    val queries = Seq((10L, 0L, Array(0.8f, 0.2f)))
      .toDF("vec_id", "label", "embedding")
    val d = Centroids.nearestClassMean(vecs, "vec_id", "label",
        "embedding", queries)
      .select("dist").as[Double].head()
    // class-0 mean = (0.95, 0.05); ||(0.8,0.2)-(0.95,0.05)|| = sqrt(0.045)
    assert(math.abs(d - math.sqrt(0.045)) < 1e-4)
  }
}
