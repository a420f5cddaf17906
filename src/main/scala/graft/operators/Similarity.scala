package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — one narrow codegen'd map computing
  * the dot product plus a TakeOrdered (no shuffle of the vectors, only k
  * rows to the driver). Scale path: IVF — vectors are pre-assigned to their
  * nearest centroid cell (one narrow map, persisted/partitioned by cell),
  * and a query scans only `nprobe` cells, pruning (1 - nprobe/C) of the
  * data. All arithmetic is double-precision column algebra over
  * `zip_with`/`aggregate` — no UDFs.
  */
object Similarity {

  /** Dot product of two array<float/double> columns: a native codegen'd
    * Catalyst expression (see [[graft.functions.DotProduct]]) — ascending-
    * index summation, bit-identical to the previous zip_with/aggregate
    * left-fold, minus the per-row intermediate array and boxing.
    */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. A zero vector has no direction: the division
    * yields NULL (non-ANSI), which `orderBy(desc)` sorts LAST — zero
    * row-vectors therefore never pollute a top-k, but callers filtering
    * on a threshold should note NULL fails every comparison.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Literal vector as a column. */
  def vec(q: Seq[Double]): Column = array(q.map(lit): _*)

  /** Brute-force cosine top-k for one query vector. A zero query vector
    * would make EVERY score NULL and return k arbitrary id-ordered rows —
    * rejected eagerly instead.
    */
  def topK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int): DataFrame = {
    require(query.exists(_ != 0.0), "query vector must be non-zero")
    df.select(col(idCol), cosine(col(vecCol), vec(query)).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF cell assignment: nearest centroid by cosine. `centroids` is a
    * small in-memory list (id -> vector) — broadcast implicitly as
    * literals; at real scale it would be a broadcast DataFrame of KMeans
    * centroids. Returns df + `cell` column; partitioning the output by
    * `cell` makes each query a partition-pruned scan.
    */
  def assignCells(df: DataFrame, vecCol: String,
      centroids: Seq[(Int, Seq[Double])]): DataFrame = {
    val scored = centroids.map { case (cid, cvec) =>
      struct(cosine(col(vecCol), vec(cvec)).as("score"), lit(cid).as("cid"))
    }
    df.withColumn("cell", greatest(scored: _*).getField("cid"))
  }

  /** IVF top-k: only the `nprobe` cells whose centroids are closest to
    * the query pay the query scoring and the top-k sort. When `df`
    * already carries a `cell` column (assigned at ingest — the production
    * posture, see [[writePartitionedByCell]]) the non-probed rows are a
    * filter away and nothing else; otherwise cell assignment costs one
    * narrow pass of C model-sized dot products per row — compute pruning
    * only, no I/O pruning. True scan pruning needs the cell-partitioned
    * layout ([[topKIvfPartitioned]], which skips non-probed FILES).
    */
  def topKIvf(df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Seq[Double])],
      query: Seq[Double], k: Int, nprobe: Int): DataFrame = {
    require(query.exists(_ != 0.0), "query vector must be non-zero")
    val probeCells = centroids
      .map { case (cid, cvec) =>
        val d = cosSim(cvec, query)
        (cid, d)
      }
      .sortBy(-_._2).take(nprobe).map(_._1)
    val assigned =
      if (df.columns.contains("cell")) df else assignCells(df, vecCol, centroids)
    assigned
      .filter(col("cell").isin(probeCells: _*))
      .select(col(idCol), cosine(col(vecCol), vec(query)).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  private def cosSim(a: Seq[Double], b: Seq[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    d / (na * nb)
  }

  /** Symmetric int8 quantization of an embedding column: per-vector scale
    * = max(|x|)/127, quantized value = floor(x/scale + 0.5) (explicit
    * floor-based rounding — identical IEEE semantics in every engine,
    * unlike round()'s half-even/half-up variations). Returns
    * struct(scale double, q array<tinyint>) — a 4x size reduction that
    * changes cosine ordering by < 1% at d=64, the standard storage trade
    * for billion-vector corpora.
    */
  def quantizeInt8(vec: Column): Column = {
    val v = vec.cast("array<double>")
    // bind the scale ONCE as a lambda variable (a raw reference inside the
    // per-element lambda would re-derive the array_max per element); an
    // all-zero vector has scale 0 and quantizes to zeros — dividing would
    // produce NaN, whose downstream handling differs across engines
    transform(array(array_max(transform(v, x => abs(x))) / 127.0d),
      s => struct(s.as("scale"),
        transform(v, x =>
          when(s === 0.0d, lit(0)).otherwise(floor(x / s + 0.5d))
            .cast("tinyint")).as("q")))
      .getItem(0)
  }

  /** Reconstruct doubles from an int8-quantized struct. */
  def dequantizeInt8(quantized: Column): Column =
    transform(quantized.getField("q"),
      x => x.cast("double") * quantized.getField("scale"))

  /** Train IVF centroids: deterministic spherical k-means (farthest-point
    * init + Lloyd iterations on the unit sphere) over a bounded sample.
    * No RNG anywhere — identical centroids on every run, cluster size,
    * and physical layout: the sample is the `maxSample` vectors with the
    * SMALLEST `xxhash64(vector)` values, a content-keyed distributed
    * top-k (per-partition heaps + driver merge — never a
    * single-partition funnel, and independent of partitioning or row
    * order, unlike `limit()`). Driver transfer is bounded by `maxSample`
    * rows of one array column; the Lloyd iterations are driver-side
    * arithmetic on k x dim doubles (model-sized, never data-sized).
    */
  def trainCentroids(df: DataFrame, vecCol: String, k: Int,
      iters: Int = 5, maxSample: Int = 2000): Seq[(Int, Seq[Double])] = {
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    val sample: Array[Array[Double]] = df
      .select(col(vecCol), xxhash64(col(vecCol)).as("__h"))
      .orderBy(col("__h"))
      .limit(maxSample)
      .collect()
      .map(_.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
        case x => x.toString.toDouble
      }.toArray)
      .map(normalize)
      // a zero vector has no direction on the unit sphere; keeping it
      // would make farthest-point init re-pick it every round (its
      // similarity to every chosen centroid is 0) — k-1 duplicate
      // degenerate centroids
      .filter(_.exists(_ != 0.0))
    require(sample.length >= k, s"need >= $k sample vectors, got ${sample.length}")
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    // farthest-point init: start from the first sample vector, greedily add
    // the vector with the smallest max-similarity to the chosen set
    val centroids = scala.collection.mutable.ArrayBuffer(sample(0))
    while (centroids.length < k) {
      val next = sample.minBy(v => centroids.map(c => dot(v, c)).max)
      centroids += next
    }
    var cents = centroids.toArray
    (0 until iters).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](sample(0).length))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        val best = (0 until k).maxBy(c => dot(v, cents(c)))
        counts(best) += 1
        var i = 0
        while (i < v.length) { sums(best)(i) += v(i); i += 1 }
      }
      cents = (0 until k).map { c =>
        if (counts(c) == 0) cents(c) else normalize(sums(c))
      }.toArray
    }
    cents.toIndexedSeq.zipWithIndex.map { case (v, i) => i -> v.toIndexedSeq }
  }

  /** Write the corpus partitioned by IVF cell: `partitionBy("cell")` lays
    * each cell out as its own directory, so a query probing `nprobe` cells
    * is a partition-pruned scan that never opens the other cells' files —
    * the I/O-level pruning that makes IVF pay off at 100 TB.
    */
  def writePartitionedByCell(df: DataFrame, vecCol: String,
      centroids: Seq[(Int, Seq[Double])], path: String): Unit =
    assignCells(df, vecCol, centroids)
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** IVF top-k over a cell-partitioned layout: the `cell` filter is a
    * partition predicate — Spark prunes non-probed cell directories at
    * planning time (zero I/O on them).
    */
  def topKIvfPartitioned(spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String, centroids: Seq[(Int, Seq[Double])],
      query: Seq[Double], k: Int, nprobe: Int): DataFrame = {
    val probeCells = centroids
      .map { case (cid, cvec) => (cid, cosSim(cvec, query)) }
      .sortBy(-_._2).take(nprobe).map(_._1)
    spark.read.parquet(path)
      .filter(col("cell").isin(probeCells: _*))
      .select(col(idCol), cosine(col(vecCol), vec(query)).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }
}
