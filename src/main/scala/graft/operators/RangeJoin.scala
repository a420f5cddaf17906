package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join without a nested-loop plan.
  *
  * Spark plans a non-equi join predicate (`p BETWEEN lo AND hi`) as a
  * BroadcastNestedLoopJoin or a cartesian product — O(|P|·|R|) comparisons
  * and a broadcast of one whole side, both non-starters at 100 TB. The
  * standard distributed fix is binning: pick a bin width `w`, map every
  * point to bin `floor(p/w)`, explode every interval into the bins it
  * covers, equi-join on the bin (plus any equi keys), and re-check the
  * exact predicate. Each (point, interval) match meets in exactly one bin
  * — the point's — so the join needs no de-duplication.
  *
  * Cost model: the interval side inflates by `len/w + 1` rows per
  * interval, the join is a plain shuffled equi-join, and the exact filter
  * runs only on bin-colocated candidates. Choose `w` near the typical
  * interval length: inflation stays O(1) per interval while each point
  * meets only the intervals in its own bin. Hot bins (many intervals or
  * points landing together) are ordinary equi-join skew, which AQE's
  * skew-join split already handles — unlike nested-loop skew, which it
  * cannot touch.
  */
object RangeJoin {

  /** Join each point row to every interval row whose `[lo, hi]` contains
    * its `pointCol` value (inclusive both ends), matching `keyCols`
    * equi-keys when given. Columns of both inputs are preserved; rows with
    * a NULL point, NULL bound, or `lo > hi` match nothing (SQL BETWEEN
    * comparison semantics).
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Double,
      keyCols: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    // The internal bin column must not shadow a user column (a pre-existing
    // __bin would be overwritten and joined on corrupted values), and
    // non-key columns shared by both inputs would survive ambiguously.
    for (df <- Seq(points, intervals))
      require(!df.columns.contains("__bin"),
        "inputs must not already contain a __bin column")
    val dupPayload = points.columns.toSet
      .intersect(intervals.columns.toSet) -- keyCols
    require(dupPayload.isEmpty,
      s"non-key columns present in both inputs: ${dupPayload.mkString(", ")}")
    val bin = (c: Column) => floor(c / lit(binWidth)).cast("long")
    val pts = points.withColumn("__bin", bin(col(pointCol)))
    val ivs = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) <= col(hiCol))
      .withColumn("__bin", explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    pts.join(ivs, keyCols :+ "__bin")
      .filter(col(pointCol).between(col(loCol), col(hiCol)))
      .drop("__bin")
  }
}
