package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, exact and
  * approximate, all designed shuffle-minimal:
  *
  *  - exact: one hash-aggregate on the dedup key (map-side combinable).
  *  - MinHash+LSH: signatures are a narrow codegen map; candidate
  *    generation explodes b bands and groups by (band, hash) — the only
  *    shuffle is on band hashes, whose buckets are near-duplicate-sized,
  *    never O(n^2).
  *  - SimHash: 64-bit signature, banded into 4x16-bit chunks for candidate
  *    generation (Hamming distance <= 3 guarantees a matching chunk by
  *    pigeonhole).
  *  - n-gram Jaccard: exact verification on candidate pairs only.
  *
  * All hashing is `xxhash64` with fixed integer seeds — fully deterministic
  * across runs and cluster sizes.
  */
object Dedup {

  /** Exact dedup: keep the minimum id per identical key. */
  def exact(df: DataFrame, idCol: String, keyCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word k-shingles of a text column. */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    when(size(toks) < k, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** MinHash signature: array of `h` independent minima of seeded
    * xxhash64 over the shingle set. Narrow, codegen'd, no shuffle.
    */
  def minhashSignature(text: Column, h: Int = 32, k: Int = 3): Column = {
    val sh = shingles(text, k)
    array((0 until h).map(i => array_min(transform(sh, s => xxhash64(s, lit(i))))): _*)
  }

  /** LSH candidate pairs from MinHash signatures: split the signature into
    * `bands` bands of `rows` hashes, bucket by (band index, band hash),
    * emit intra-bucket pairs. Collision probability for Jaccard s is
    * 1-(1-s^rows)^bands (the standard S-curve).
    */
  def minhashCandidates(
      df: DataFrame, idCol: String, textCol: String,
      bands: Int = 8, rows: Int = 4, k: Int = 3
  ): DataFrame = {
    val sig = minhashSignature(col(textCol), bands * rows, k)
    val banded = df
      .select(col(idCol).as("id"), sig.as("sig"))
      .select(col("id"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows))))))
      .toDF("id", "band", "bucket")
    val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact n-gram (word-shingle) Jaccard similarity between two texts. */
  def jaccard(textA: Column, textB: Column, k: Int = 3): Column = {
    val sa = array_distinct(shingles(textA, k))
    val sb = array_distinct(shingles(textB, k))
    val inter = size(array_intersect(sa, sb)).cast("double")
    inter / (size(sa) + size(sb) - inter)
  }

  /** MinHash near-dup pairs with exact Jaccard verification of candidates:
    * the verify join only touches candidate pairs (bucket-sized), never the
    * full cross product.
    */
  def minhashNearDups(
      df: DataFrame, idCol: String, textCol: String, threshold: Double,
      bands: Int = 8, rows: Int = 4, k: Int = 3
  ): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, bands, rows, k)
    val docsA = df.select(col(idCol).as("id_a"), col(textCol).as("__text_a"))
    val docsB = df.select(col(idCol).as("id_b"), col(textCol).as("__text_b"))
    cands.join(docsA, "id_a").join(docsB, "id_b")
      .withColumn("jaccard", jaccard(col("__text_a"), col("__text_b"), k))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash of the token stream: bit i of the signature is the
    * sign of sum over tokens of (+1/-1 for bit i of xxhash64(token)).
    * Expressed as a 64-element vote vector folded with zip_with.
    */
  def simhash(text: Column): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    val votes = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (a, i) => a + when(call_function("shiftright", h, i.cast("int")).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      })
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, i) => when(v > 0, call_function("shiftleft", lit(1L), i.cast("int"))).otherwise(0L)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash candidate pairs: band the 64-bit signature into 4 x 16-bit
    * chunks; any pair within Hamming distance 3 shares at least one chunk.
    */
  def simhashCandidates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sig = simhash(col(textCol))
    val banded = df.select(col(idCol).as("id"), sig.as("sig"))
      .select(col("id"), col("sig"), posexplode(
        transform(sequence(lit(0), lit(3)),
          b => call_function("shiftright", col("sig"), b * 16).bitwiseAND(0xFFFFL))))
      .toDF("id", "sig", "band", "chunk")
    val a = banded.select(col("band"), col("chunk"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("chunk"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
  }

  /** Sign bit of one fixed pseudo-random hyperplane projection: plane
    * coefficient j of plane p is a centered seeded hash in [-0.5, 0.5) —
    * deterministic across runs and cluster sizes, no stored model.
    */
  private def planeBit(vec: Column, p: Int): Column = {
    val dot = aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, j) => x.cast("double") *
          ((pmod(xxhash64(j.cast("long") * 1000003L + p), lit(1000000L)).cast("double") /
            1000000.0d) - 0.5d)),
      lit(0.0d), (acc, x) => acc + x)
    when(dot > 0, lit(1L)).otherwise(lit(0L))
  }

  /** Embedding-cosine near-duplicate pairs via banded random-hyperplane
    * LSH: `tables` independent hash tables of `planesPerTable` sign bits
    * each (recall 1-(1-p^k)^L, the standard multi-table trade-off); a pair
    * is a candidate when any table's bucket matches; exact cosine verifies
    * candidates only. The only shuffle is the (table, bucket) self-join,
    * whose buckets are ~n/2^k sized — never O(n^2).
    */
  def cosineNearDups(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planesPerTable: Int = 4, tables: Int = 8
  ): DataFrame = {
    val bucketCols = (0 until tables).map { t =>
      (0 until planesPerTable)
        .map(b => planeBit(col(vecCol), t * planesPerTable + b) * (1L << b))
        .reduce(_ + _)
    }
    val banded = df
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        posexplode(array(bucketCols: _*)))
      .toDF("id", "vec", "table", "bucket")
    val a = banded.select(col("table"), col("bucket"),
      col("id").as("id_a"), col("vec").as("vec_a"))
    val b = banded.select(col("table"), col("bucket"),
      col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "vec_a", "vec_b").distinct()
      .withColumn("cosine", Similarity.cosine(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
