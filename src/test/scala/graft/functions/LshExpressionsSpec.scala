package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.SparkTestSession
import graft.operators.Dedup

/** Bit-identity of the native LSH kernels against the SQL formulations
  * they replaced, on real document text.
  */
class LshExpressionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("MinHashSignature == array_min/transform/xxhash64 formulation, bit for bit") {
    val h = 32
    val sh = array_distinct(Dedup.shingles($"text"))
    val prepared = docs.select($"doc_id", sh.as("sh"))
    val native = prepared
      .select($"doc_id", LshExpressions.minhashSignature($"sh", h).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val viaSql = prepared
      .select($"doc_id", array((0 until h).map(i =>
        array_min(transform($"sh", s => xxhash64(s, lit(i))))): _*).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(native == viaSql)
    assert(native.nonEmpty)
  }

  test("SimHash64 == 64-fold aggregate formulation, bit for bit") {
    val hs = Dedup.tokenHashes($"text")
    val prepared = docs.select($"doc_id", hs.as("hs"))
    val native = prepared
      .select($"doc_id", LshExpressions.simhash64($"hs").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaSql = prepared
      .select($"doc_id", (0 until 64).map { i =>
        val vote = aggregate($"hs", lit(0L),
          (a, x) => a + when(shiftright(x, i).bitwiseAND(1) === 1, 1L).otherwise(-1L))
        when(vote > 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == viaSql)
  }

  test("MinHashFromHashes(xxhash64(sh)) == MinHashSignature(sh), bit for bit") {
    val h = 32
    val prepared = docs.select($"doc_id",
      array_distinct(Dedup.shingles($"text")).as("sh"))
    val fromStrings = prepared
      .select($"doc_id", LshExpressions.minhashSignature($"sh", h).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    // Spark's default-seed xxhash64 of the shingle string IS the kernel's
    // per-shingle base, so hashed shingles give identical signatures
    val fromHashes = prepared
      .select($"doc_id", LshExpressions.minhashFromHashes(
        transform($"sh", s => xxhash64(s)), h).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(fromStrings == fromHashes)
    assert(fromStrings.nonEmpty)
  }

  test("SortedIntersectCount == array_intersect size on sorted distinct arrays") {
    val prepared = docs.select($"doc_id", Dedup.shingleHashes($"text").as("sh"))
    val a = prepared.select($"doc_id".as("id_a"), $"sh".as("sa")).filter($"id_a" < 40)
    val b = prepared.select($"doc_id".as("id_b"), $"sh".as("sb")).filter($"id_b" < 40)
    val pairs = a.crossJoin(b).filter($"id_a" < $"id_b")
    val rows = pairs.select($"id_a", $"id_b",
      LshExpressions.sortedIntersectCount($"sa", $"sb").as("native"),
      size(array_intersect($"sa", $"sb")).as("builtin"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(2) == r.getInt(3),
        s"(${r.getLong(0)},${r.getLong(1)}): native ${r.getInt(2)} != builtin ${r.getInt(3)}")
    }
    // null elements are skipped (sort_array places them first)
    graft.functions.GraftFunctions.register(spark)
    val withNulls = spark.sql(
      "SELECT graft_sorted_intersect(array(CAST(NULL AS LONG), 1L, 5L), " +
        "array(1L, 5L, 9L)) AS n")
    assert(withNulls.collect()(0).getInt(0) == 2)
  }

  test("HyperplaneBuckets == transform/zip_with/aggregate formulation, bit for bit") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rnd = new scala.util.Random(42L)
    val planes = IndexedSeq.fill(32)(IndexedSeq.fill(64)(rnd.nextGaussian()))
    // the SQL formulation the native kernel replaced (kept here as the
    // independent semantics reference)
    val planesLit = typedlit(planes.map(_.toSeq).toSeq)
    val bits = transform(planesLit, p =>
      when(aggregate(zip_with($"embedding", p, (x, y) => x.cast("double") * y),
        lit(0.0d), (acc, x) => acc + x) > 0, 1L).otherwise(0L))
    val sqlCodes = array((0 until 8).map { t =>
      aggregate(slice(col("__bits"), t * 4 + 1, 4),
        lit(0L), (acc, x) => acc * 2 + x)
    }: _*)
    val both = emb.withColumn("__bits", bits)
      .select($"vec_id", sqlCodes.as("sql_codes"),
        LshExpressions.hyperplaneBuckets($"embedding", planes, 4).as("native"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"row ${r.getLong(0)}")
    }
    // degenerate inputs follow the SQL null semantics: a wrong-length or
    // null-element vector nulls every plane dot -> every table code 0
    val weird = Seq(
      (1L, Seq(1.0d, 2.0d)),                       // wrong dim
    ).toDF("id", "v")
      .union(spark.sql("SELECT 2L, array(CAST(NULL AS DOUBLE), 1.0d)"))
    val degen = weird.select(
      LshExpressions.hyperplaneBuckets($"v",
        IndexedSeq.fill(4)(IndexedSeq.fill(64)(0.5)), 2).as("c")).collect()
    degen.foreach(r => assert(r.getSeq[Long](0) == Seq(0L, 0L)))
    // codegen active on the file-backed plan
    val plan = emb.select(LshExpressions.hyperplaneBuckets($"embedding", planes, 4))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)") && plan.contains("graft_hyperplane_buckets"),
      s"no codegen span:\n${plan.take(400)}")
  }

  test("NearestCentroid == greatest(struct(cosine,cid)) formulation; degenerate -> null") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = graft.operators.Similarity.trainCentroids(emb, "embedding", 16)
    // the SQL formulation the native kernel replaced (independent
    // semantics reference): argmax cosine with larger-cid tie-break
    val scored = cents.map { case (cid, cvec) =>
      struct(graft.operators.Similarity.cosine($"embedding",
        graft.operators.Similarity.vec(cvec)).as("score"), lit(cid).as("cid"))
    }
    val both = emb.select($"vec_id",
      greatest(scored: _*).getField("cid").as("sql_cell"),
      LshExpressions.nearestCentroid($"embedding", cents.map(_._2)).as("native"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"row ${r.getLong(0)}")
    }
    // wrong-length, null-element, or NaN-element vectors assign to NULL
    // (NaN poisons every dot product — no cell is meaningful; documented
    // divergence from greatest()'s NaN-as-largest last-cell accident)
    val dim = cents.head._2.length
    val nanVec = ("1.0d" +: Seq.fill(dim - 1)("CAST('NaN' AS DOUBLE)"))
      .mkString("array(", ",", ")")
    val weird = Seq((1L, Seq(1.0d, 2.0d))).toDF("id", "v")
      .union(spark.sql("SELECT 2L, array(CAST(NULL AS DOUBLE), 1.0d)"))
      .union(spark.sql(s"SELECT 3L, $nanVec"))
    val degen = weird.select(
      LshExpressions.nearestCentroid($"v", cents.map(_._2)).as("c")).collect()
    degen.foreach(r => assert(r.isNullAt(0)))
    // codegen active on the file-backed plan
    val plan = emb.select(
      LshExpressions.nearestCentroid($"embedding", cents.map(_._2)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)") && plan.contains("graft_nearest_centroid"),
      s"no codegen span:\n${plan.take(400)}")
  }

  test("PqEncode == least(struct(dist,cid)) formulation; degenerate -> null") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val cb = graft.operators.Similarity.trainPq(emb, "v", m = 8, ksub = 16)
    val dsub = cb.head.head.length
    // the SQL formulation the native kernel replaced
    val sqlCodes = array(cb.indices.map { s =>
      val subv = slice($"v", s * dsub + 1, dsub)
      val scored = cb(s).zipWithIndex.map { case (cw, cid) =>
        struct(
          aggregate(zip_with(subv, typedlit(cw), (x, y) => (x - y) * (x - y)),
            lit(0.0d), (a, x) => a + x).as("d"),
          lit(cid).as("cid"))
      }
      least(scored: _*).getField("cid")
    }: _*)
    val both = emb.select($"vec_id", sqlCodes.as("sql_codes"),
      LshExpressions.pqEncode($"v", cb).as("native")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2), s"row ${r.getLong(0)}")
    }
    // wrong-length or null-element vectors encode to NULL, explicitly
    val weird = Seq((1L, Seq(1.0d, 2.0d))).toDF("id", "v")
      .union(spark.sql("SELECT 2L, array(CAST(NULL AS DOUBLE), 1.0d)"))
    val degen = weird.select(LshExpressions.pqEncode($"v", cb).as("c")).collect()
    degen.foreach(r => assert(r.isNullAt(0)))
    // codegen active on the file-backed plan
    val plan = emb.select(LshExpressions.pqEncode($"v", cb))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)") && plan.contains("graft_pq_encode"),
      s"no codegen span:\n${plan.take(400)}")
  }

  test("PqEncode handles ragged codebooks where a later subspace is larger") {
    // head subspace has FEWER codewords than the second: the flat-array
    // stride must size to the max, not the head (regression: OOB write)
    val cb: IndexedSeq[IndexedSeq[IndexedSeq[Double]]] = IndexedSeq(
      IndexedSeq(IndexedSeq(0.0, 0.0), IndexedSeq(10.0, 10.0)),
      IndexedSeq(IndexedSeq(0.0, 0.0), IndexedSeq(5.0, 5.0),
        IndexedSeq(20.0, 20.0), IndexedSeq(-7.0, -7.0)))
    val rows = Seq(
      (1L, Seq(9.0, 9.0, 19.0, 21.0)),  // -> (1, 2): codeword id beyond head's count
      (2L, Seq(0.1, -0.1, -6.0, -8.0)), // -> (0, 3)
      (3L, Seq(1.0, 1.0, 4.0, 6.0)))    // -> (0, 1)
      .toDF("id", "v")
    val got = rows.select($"id", LshExpressions.pqEncode($"v", cb).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got(1L) == Seq(1, 2) && got(2L) == Seq(0, 3) && got(3L) == Seq(0, 1),
      s"ragged-codebook encoding wrong: $got")
  }

  test("null array ELEMENTS are skipped by the minhash/simhash kernels") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_minhash_hashed(array(CAST(NULL AS LONG), 7L, 99L), 4) AS a, " +
        "graft_minhash_hashed(array(7L, 99L), 4) AS b, " +
        "graft_simhash(array(CAST(NULL AS LONG), 7L, 99L)) AS c, " +
        "graft_simhash(array(7L, 99L)) AS d, " +
        "graft_minhash(array(CAST(NULL AS STRING), 'x y z'), 4) AS e, " +
        "graft_minhash(array('x y z'), 4) AS f").collect()(0)
    assert(r.getSeq[Long](0) == r.getSeq[Long](1),
      "null long element must not vote as hash 0")
    assert(r.getLong(2) == r.getLong(3),
      "null token hash must cast no simhash votes")
    assert(r.getSeq[Long](4) == r.getSeq[Long](5),
      "null shingle string must be treated as absent")
  }

  test("null inputs yield null; codegen stage active") {
    val df = Seq((1L, Some(Seq("a b c", "b c d"))), (2L, None))
      .toDF("id", "sh")
    val out = df.select($"id", LshExpressions.minhashSignature($"sh", 4).as("sig"))
    val rows = out.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!rows(1L) && rows(2L))
    // codegen check on a file-backed plan (a LocalRelation constant-folds
    // the whole projection driver-side, bypassing codegen entirely)
    val onFiles = docs.select(
      LshExpressions.minhashSignature(array_distinct(Dedup.shingles($"text")), 4))
    val plan = onFiles.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)") && plan.contains("graft_minhash"),
      s"no codegen span:\n${plan.take(400)}")
  }
}
