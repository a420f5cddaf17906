package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate string join (edit distance) without a cross join.
  *
  * A naive fuzzy join is |L|·|R| `levenshtein` calls behind a nested-loop
  * plan — unusable at scale. Length banding cuts it to an equi-join: edit
  * distance >= |len(a) - len(b)|, so a pair within `maxDist` has lengths
  * within `maxDist` of each other. Each left row keys on its own length;
  * each right row explodes into the `2*maxDist + 1` length buckets its
  * partners could occupy. A matching pair meets in exactly one bucket
  * (the left row's length), so the join needs no de-duplication, and the
  * exact `levenshtein(a, b) <= maxDist` verify runs only on
  * bucket-colocated candidates, inside the join stage's codegen.
  *
  * Cost model: the right side inflates 2·maxDist+1 times (maxDist is
  * small — 1..3 in entity-resolution practice), the join is a plain
  * shuffled equi-join on an int key, and the quadratic verify is confined
  * to same-length-window groups. Buckets skewed by a popular string
  * length are ordinary equi-join skew — AQE's skew split handles them,
  * which it cannot do for the nested-loop plan this replaces.
  */
object FuzzyJoin {

  /** Join rows of `left` and `right` whose string columns are within
    * `maxDist` edits (NULL strings match nothing). Output:
    * (leftId, rightId, leftStr, rightStr, dist).
    */
  def editDistanceJoin(
      left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    // spread the verify's probe input: the bounded-levenshtein pass over
    // every length-banded candidate ran as ONE 1.9 s task behind the
    // small-SF scan's single split (StageProfile r20) — the broadcast
    // band join keeps its probe side's partitioning, so the floor must
    // be set here; the join result is a set, placement-independent
    val l = ScaleOps.spreadCpu(
        left.select(col(leftId).as("__lid"), col(leftStr).as("__ls"))
          .filter(col("__ls").isNotNull))
      .withColumn("__bucket", length(col("__ls")))
    val r = right.select(col(rightId).as("__rid"), col(rightStr).as("__rs"))
      .filter(col("__rs").isNotNull)
      .withColumn("__bucket",
        explode(sequence(greatest(length(col("__rs")) - maxDist, lit(0)),
          length(col("__rs")) + maxDist)))
    // bounded levenshtein: abandons a pair as soon as its running distance
    // exceeds maxDist (returns -1) — the verify cost per candidate is
    // O(maxDist * len), not O(len^2)
    l.join(r, "__bucket")
      .withColumn("dist", levenshtein(col("__ls"), col("__rs"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("__lid").as(leftId), col("__rid").as(rightId),
        col("__ls").as(leftStr), col("__rs").as(rightStr), col("dist"))
  }
}
