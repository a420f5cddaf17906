package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.SparkTestSession

/** Custom typed Aggregators and SQL function registration. */
class AggregatorsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  test("bitmap distinct == exact COUNT(DISTINCT) per group") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val got = li.groupBy("l_returnflag")
      .agg(Aggregators.bitmapDistinct(col("l_suppkey"), 100000).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_suppkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("heavy hitters: every item above the n/(k+1) guarantee is present") {
    // 1000 rows: "big" 400x, "mid" 250x, tail of 350 distinct singletons
    val rows = Seq.fill(400)("big") ++ Seq.fill(250)("mid") ++
      (0 until 350).map(i => s"t$i")
    val df = rows.toDF("w").repartition(8) // force multi-partition merges
    val k = 10
    val got = df.agg(Aggregators.heavyHitters(col("w"), k).as("hh"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1))
    val keys = got.map(_._1).toSet
    // guarantee: freq > n/(k+1) = 90.9 -> "big" and "mid" must survive
    assert(keys.contains("big") && keys.contains("mid"))
    // counts are lower bounds
    val counts = got.toMap
    assert(counts("big") <= 400 && counts("mid") <= 250)
    assert(got.size <= k)
  }

  test("count-min sketch: overestimates only, within eps*N; partials merge") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val eps = 0.005
    def sketchOf(df: org.apache.spark.sql.DataFrame) =
      org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(
          df.selectExpr(s"count_min_sketch(l_suppkey, ${eps}d, 0.99d, 42)")
            .collect()(0).getAs[Array[Byte]](0)))
    val cms = sketchOf(li)
    val n = li.count()
    val exact = li.groupBy("l_suppkey").count().limit(20)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    exact.foreach { case (key, cnt) =>
      val est = cms.estimateCount(key)
      assert(est >= cnt, s"CMS underestimated $key: $est < $cnt")
      assert(est <= cnt + (eps * n).toLong + 1,
        s"CMS error bound blown for $key: $est vs $cnt (n=$n)")
    }
    // sketches built on disjoint halves merge into the whole-data sketch
    val a = sketchOf(li.filter($"l_orderkey" % 2 === 0))
    val b = sketchOf(li.filter($"l_orderkey" % 2 =!= 0))
    a.mergeInPlace(b)
    exact.take(5).foreach { case (key, _) =>
      assert(a.estimateCount(key) == cms.estimateCount(key),
        s"merged sketch diverged from global sketch on $key")
    }
  }

  test("native expressions callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").collect()(0)
    assert(r.getDouble(0) == 11.0)
    val sig = spark.sql(
      "SELECT graft_minhash(array('a b c', 'b c d'), 4) AS s").collect()(0)
    assert(sig.getSeq[Long](0).length == 4)
    val sh = spark.sql(
      "SELECT graft_simhash(array(1L, 2L, 3L)) AS s").collect()(0)
    assert(!sh.isNullAt(0))
    // the native aggregate is callable from SQL too
    val hh = spark.sql(
      "SELECT graft_heavy_hitters(w, 2) AS top FROM VALUES ('a'),('a'),('b'),('a') t(w)")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(hh.head.getString(0) == "a" && hh.head.getLong(1) >= 2L)
    val si = spark.sql(
      "SELECT graft_sorted_intersect(array(1L,3L,5L), array(3L,4L,5L)) AS n")
      .collect()(0).getInt(0)
    assert(si == 2)
    val tk = spark.sql(
      "SELECT graft_topk_pairs(s, i, 2) AS t FROM VALUES (1.0d, 10L), (3.0d, 30L), (2.0d, 20L) t(s, i)")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(tk.map(r => (r.getDouble(0), r.getLong(1))) == Seq((3.0, 30L), (2.0, 20L)))
    // nearest-centroid kernel with an inline literal centroid matrix:
    // (0.9, 0.1) is nearest (cosine) to the x-axis row 0
    val nc = spark.sql(
      "SELECT graft_nearest_centroid(array(0.9d, 0.1d), " +
        "array(array(1.0d, 0.0d), array(0.0d, 1.0d))) AS c")
      .collect()(0).getInt(0)
    assert(nc == 0)
  }
}
