package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.SparkTestSession

/** Randomized AvroFiles round-trip: seeded trials over random schemas
  * (every supported type, random nullability), random row sets (nulls,
  * empties, unicode, numeric extremes, NaN/Inf), random partitioning —
  * read-back must equal the input EXACTLY (the container is the only
  * thing between the two DataFrames), and corrupting any single
  * container byte-prefix must quarantine, never throw.
  */
class AvroFuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  private val gens: Seq[(DataType, scala.util.Random => Any)] = Seq(
    LongType -> (r => r.nextInt(5) match {
      case 0 => Long.MaxValue
      case 1 => Long.MinValue
      case _ => r.nextLong()
    }),
    IntegerType -> (r => if (r.nextBoolean()) r.nextInt()
      else Seq(Int.MaxValue, Int.MinValue, 0)(r.nextInt(3))),
    DoubleType -> (r => r.nextInt(6) match {
      case 0 => Double.NaN
      case 1 => Double.PositiveInfinity
      case 2 => -0.0d
      case _ => r.nextDouble() * math.pow(10, r.nextInt(20) - 10)
    }),
    FloatType -> (r => if (r.nextBoolean()) r.nextFloat()
      else Seq(Float.NaN, Float.MinPositiveValue)(r.nextInt(2))),
    BooleanType -> (r => r.nextBoolean()),
    StringType -> (r => r.nextInt(4) match {
      case 0 => ""
      case 1 => "snowman ☃ and 😀 emoji"
      case 2 => (0 until r.nextInt(50)).map(_ =>
        ('a' + r.nextInt(26)).toChar).mkString
      case _ => "line\nbreak\tand\u0000nul"
    }),
    BinaryType -> (r => {
      val b = new Array[Byte](r.nextInt(40))
      r.nextBytes(b); b
    }),
    // r16 matrix: logical types + nested shapes. Timestamps at micros
    // granularity (Catalyst truncates to micros anyway, so the compare
    // sees identical values), dates across the epoch, decimals with a
    // fixed (12,4) shape incl. negatives, arrays with/without null
    // elements, a nested record, a string-keyed map.
    TimestampType -> (r => java.time.Instant.ofEpochSecond(
      r.nextInt(2000000000).toLong, r.nextInt(1000000) * 1000L)),
    DateType -> (r => java.time.LocalDate.ofEpochDay(
      (r.nextInt(40000) - 10000).toLong)),
    DecimalType(12, 4) -> (r => new java.math.BigDecimal(
      java.math.BigInteger.valueOf(r.nextLong() % 100000000L), 4)),
    ArrayType(LongType, containsNull = false) ->
      (r => (0 until r.nextInt(5)).map(_ => r.nextLong())),
    ArrayType(StringType, containsNull = true) ->
      (r => (0 until r.nextInt(4)).map(i =>
        if (r.nextInt(4) == 0) null else s"s$i${r.nextInt(100)}")),
    StructType(Seq(StructField("a", LongType, nullable = false),
      StructField("b", StringType, nullable = true))) ->
      (r => Row(r.nextLong(), if (r.nextBoolean()) s"x${r.nextInt(100)}" else null)),
    MapType(StringType, LongType, valueContainsNull = false) ->
      (r => (0 until r.nextInt(4)).map(i => s"k$i" -> r.nextLong()).toMap))

  test("seeded random schemas x rows round-trip exactly; corrupt " +
      "prefixes always quarantine") {
    var trials = 0
    for (seed <- 1 to 12) {
      val rnd = new scala.util.Random(seed)
      // id column first (stable compare key), then 1..5 random typed cols
      val picked = (0 until (1 + rnd.nextInt(5)))
        .map(i => (s"c$i", gens(rnd.nextInt(gens.length)), rnd.nextBoolean()))
      val schema = StructType(
        StructField("id", LongType, nullable = false) +:
          picked.map { case (n, (dt, _), nullable) =>
            StructField(n, dt, nullable) })
      val nRows = 1 + rnd.nextInt(60)
      val rows = (0 until nRows).map { i =>
        Row.fromSeq(i.toLong +: picked.map { case (_, (_, gen), nullable) =>
          if (nullable && rnd.nextInt(4) == 0) null else gen(rnd)
        })
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1 + rnd.nextInt(4)), schema)
      val out = SparkTestSession.tmpPath(s"avro_fuzz_$seed")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      AvroFiles.write(df, out)
      val back = AvroFiles.read(spark, out, schema)
      assert(back.filter(col("error").isNotNull).count() == 0,
        s"seed=$seed: unexpected quarantine")
      // exact-equality compare keyed on id; canonicalize binary to seq
      // and NaN to a marker (NaN != NaN)
      def canon(r: Row): Seq[Any] = r.toSeq.map {
        case b: Array[Byte] => b.toSeq
        case d: Double if d.isNaN => "NaN"
        case f: Float if f.isNaN => "NaN"
        case x => x
      }
      val wantRows = df.collect().map(r => r.getLong(0) -> canon(r)).toMap
      val gotRows = back.drop("error").collect()
        .map(r => r.getLong(0) -> canon(r)).toMap
      assert(gotRows == wantRows,
        s"seed=$seed round-trip diverged: " +
          s"${(gotRows.toSet -- wantRows.toSet).take(3)} vs " +
          s"${(wantRows.toSet -- gotRows.toSet).take(3)}")
      // corruption: truncate the container at a random prefix — the
      // reader must quarantine that file (or, for a prefix that still
      // parses as a complete block boundary, read a subset) and never
      // throw; good rows never exceed the original count
      val dir = new java.io.File(out)
      val avroFile = dir.listFiles().filter(_.getName.endsWith(".avro")).head
      val bytes = java.nio.file.Files.readAllBytes(avroFile.toPath)
      val cut = 1 + rnd.nextInt(math.max(1, bytes.length - 1))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(out, "corrupt.avro"), bytes.take(cut))
      val mixed = AvroFiles.read(spark, out, schema)
      val goodFromCorrupt = mixed.count() - back.count()
      assert(goodFromCorrupt >= 0 && mixed.count() <= 2L * nRows + 1,
        s"seed=$seed: corrupt container inflated rows")
      trials += 1
    }
    assert(trials == 12)
  }
}
