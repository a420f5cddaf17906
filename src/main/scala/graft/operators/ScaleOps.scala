package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout and skew operators for the 100 TB design point:
  *
  *  - bucketed tables: both join sides pre-hashed into the same bucket
  *    count on the join key, so repeated fact-to-fact joins are
  *    co-partitioned and run WITHOUT a shuffle exchange — the dominant
  *    cost of a petabyte join is gone from every downstream query that
  *    reuses the layout.
  *  - salted join: for key skew beyond what AQE's skew-split handles —
  *    the big side salts each row into `saltFactor` sub-keys, the small
  *    side replicates per salt, so one hot key spreads over `saltFactor`
  *    tasks instead of one straggler.
  *  - deterministic hash split: stable train/validation/test assignment
  *    from the row's own id — reproducible across runs, cluster sizes,
  *    and re-partitioning, with no stored split table.
  */
object ScaleOps {

  /** Write a DataFrame as a bucketed table: rows are hash-partitioned into
    * `buckets` files per partition by `key` at write time. Two tables
    * bucketed with the same key and bucket count join shuffle-free.
    */
  def writeBucketed(df: DataFrame, key: String, table: String,
      path: String, buckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key: with matching bucket
    * counts Catalyst plans a sort-merge join with NO exchange on either
    * side (assert with `.queryExecution.executedPlan`).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Salted join of a skewed big side against a small side on `key`:
    * big rows get a deterministic salt in [0, saltFactor) derived from a
    * uniqueness column, the small side is replicated once per salt value,
    * and the join keys on (key, salt). Result rows are identical to the
    * plain join; the hot key's rows are spread over `saltFactor` tasks.
    * Use when one key holds so much of the data that even AQE's skew
    * split leaves a straggler (e.g. an empty-string or null-ish sentinel
    * key holding 30% of a web corpus).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltCol: String, saltFactor: Int = 16): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col(saltCol)), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Deterministic stratified sampling: keep each row with its stratum's
    * fraction, decided by seeded xxhash64 of the id — reproducible across
    * runs and layouts (unlike `sample()`), with no shuffle: the stratum
    * fraction lookup is a literal CASE over the (small) strata map and
    * the filter is a narrow map evaluated inside the scan stage. The
    * training-data use: balance languages/sources by downsampling the
    * dominant strata.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 1.0,
      seed: Int = 11): DataFrame = {
    val resolution = 1000000L
    val frac = fractions.foldLeft(lit(defaultFraction)) {
      case (acc, (k, f)) => when(col(strataCol) === lit(k), lit(f)).otherwise(acc)
    }
    df.filter(
      pmod(xxhash64(col(idCol), lit(seed)), lit(resolution)) <
        (frac * resolution).cast("long"))
  }

  /** Deterministic split assignment: bucket each row into split i with
    * probability fractions(i), by seeded xxhash64 of the id column. The
    * same id always lands in the same split — across runs, engines of
    * any size, and data re-layout — which is exactly what a training
    * pipeline needs from a train/val/test split (no leakage when data is
    * re-ingested or re-partitioned).
    */
  def hashSplit(df: DataFrame, idCol: String, fractions: Seq[Double],
      seed: Int = 7, splitCol: String = "split"): DataFrame = {
    require(math.abs(fractions.sum - 1.0) < 1e-9, "fractions must sum to 1")
    val resolution = 1000000L
    val cuts = fractions.scanLeft(0.0)(_ + _).map(f => (f * resolution).toLong)
    val h = pmod(xxhash64(col(idCol), lit(seed)), lit(resolution))
    val assign = cuts.sliding(2).zipWithIndex.foldLeft(lit(fractions.size - 1)) {
      case (acc, (Seq(lo, hi), i)) => when(h >= lo && h < hi, lit(i)).otherwise(acc)
    }
    df.withColumn(splitCol, assign)
  }
}
