package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, batch-decoded per partition.
  *
  * The decode itself is STUBBED (no image/audio libraries in this
  * container): `decodeImageStub` derives deterministic fake dimensions from
  * the payload bytes. Everything around it is the real Spark shape a
  * production decode would use — a `mapPartitions` over an iterator of
  * rows, so a native decoder (JNI/FFI) amortizes per-partition setup
  * exactly as a Pandas-UDF batch would, the binary column never passes
  * through a driver, and partition sizing controls decoder memory.
  */
object Multimodal {

  /** Typed metadata produced by the (stub) decoder. */
  val imageMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("byte_len", LongType, nullable = false)))

  /** STUB image decode: deterministic fake metadata from payload bytes.
    * A real implementation would parse the image header / decode frames
    * here; the signature, batching, and schema are what production uses.
    */
  def decodeImageStub(payload: Array[Byte]): Row = {
    val len = payload.length.toLong
    var h = 1125899906842597L // deterministic FNV-ish fold over bytes
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    Row(
      (math.floorMod(h, 512L) + 32L).toInt,
      (math.floorMod(h >> 9, 512L) + 32L).toInt,
      3,
      len)
  }

  /** Attach a binary payload column (here derived from text — in
    * production this is the raw image/audio bytes from parquet).
    */
  def withPayload(df: DataFrame, srcCol: String, payloadCol: String): DataFrame =
    df.withColumn(payloadCol, encode(col(srcCol), "UTF-8"))

  /** Batch decode: one decoder instantiation per partition, metadata
    * struct per row. A Dataset-level mapPartitions keeps the operator
    * inside one query plan (no RDD round-trip, no plan break): upstream
    * column pruning still reaches the scan and downstream operators
    * compose on the same DataFrame.
    */
  def decodeImages(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder setup would go here (amortized)
        rows.map { case (id, payload) =>
          val m = decodeImageStub(payload)
          (id, (m.getInt(0), m.getInt(1), m.getInt(2), m.getLong(3)))
        }
      }
      .toDF("id", "meta")
      .withColumn("meta", col("meta").cast(imageMetaSchema))
  }

  /** Deterministic frame sampling plan for a (stub) video payload: every
    * `stride`-th frame index under `maxFrames` — the Spark-side shape of a
    * frame-extraction fan-out (`explode` of the frame plan).
    */
  def frameSamplePlan(df: DataFrame, idCol: String, nFramesCol: String,
      stride: Int, maxFrames: Int): DataFrame =
    df.select(col(idCol),
      explode(sequence(lit(0),
        least(col(nFramesCol) - 1, lit(maxFrames * stride - 1)), lit(stride)))
        .as("frame_idx"))

  /** Overlapping chunk plan for a (stub) audio payload: fixed-size windows
    * every `hop` samples, clamped to the payload length — the fan-out a
    * feature extractor (e.g. mel spectrogram) consumes. Pure column
    * algebra: one explode, no UDF.
    */
  def audioChunkPlan(df: DataFrame, idCol: String, nSamplesCol: String,
      chunk: Int, hop: Int): DataFrame =
    df.filter(col(nSamplesCol) > 0)
      .select(col(idCol), col(nSamplesCol),
        explode(sequence(lit(0),
          greatest(col(nSamplesCol) - chunk, lit(0)), lit(hop)))
          .as("chunk_start"))
      .withColumn("chunk_end",
        least(col("chunk_start") + chunk, col(nSamplesCol)))
      .drop(nSamplesCol)
}
