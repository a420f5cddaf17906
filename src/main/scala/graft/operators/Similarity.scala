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

  /** Dot product of two array<float/double> columns (left-fold, fixed
    * evaluation order — deterministic).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Literal vector as a column. */
  def vec(q: Seq[Double]): Column = array(q.map(lit): _*)

  /** Brute-force cosine top-k for one query vector. */
  def topK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int): DataFrame =
    df.select(col(idCol), cosine(col(vecCol), vec(query)).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)

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

  /** IVF top-k: score only the `nprobe` cells whose centroids are closest
    * to the query — the other cells are never scanned.
    */
  def topKIvf(df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Seq[Double])],
      query: Seq[Double], k: Int, nprobe: Int): DataFrame = {
    val probeCells = centroids
      .map { case (cid, cvec) =>
        val d = cosSim(cvec, query)
        (cid, d)
      }
      .sortBy(-_._2).take(nprobe).map(_._1)
    assignCells(df, vecCol, centroids)
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
}
