package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro object-container-file (OCF) source/sink built directly on the
  * core `org.apache.avro` library that ships with Spark — the
  * `spark-avro` CONNECTOR jar does not (it is a separate artifact), so
  * this is a self-contained container walk in the [[TarShards]] posture:
  * distributed write through the Hadoop FS API (one container file per
  * task), read via Spark's `binaryFile` source + a per-file
  * `DataFileStream` walk, per-file quarantine instead of task failure.
  *
  * Type contract (the ingestion subset): long/int/double/float/boolean/
  * string/binary columns, each written as the matching Avro primitive —
  * nullable fields as `union(null, T)`. Avro's own deflate codec handles
  * compression. Field resolution on read is BY NAME against the caller's
  * schema (a container written with extra fields reads fine; a missing
  * field reads NULL — the mergeSchema-style evolution rule).
  *
  * Shape at scale: one container file per write task (size your
  * partitions, not your cluster), one `binaryFile` row = one read task's
  * work, member decode is a per-partition flatMap with zero shuffles.
  */
object AvroFiles {

  private def avroType(dt: DataType): String = dt match {
    case LongType => "\"long\""
    case IntegerType => "\"int\""
    case DoubleType => "\"double\""
    case FloatType => "\"float\""
    case BooleanType => "\"boolean\""
    case StringType => "\"string\""
    case BinaryType => "\"bytes\""
    case other => throw new IllegalArgumentException(
      s"AvroFiles supports long/int/double/float/boolean/string/binary " +
        s"columns, got $other")
  }

  /** Avro record schema (JSON) for a Spark struct — nullable fields as
    * `["null", T]` with a null default. */
  private[sources] def avroSchemaJson(schema: StructType): String = {
    val fields = schema.fields.map { f =>
      val t =
        if (f.nullable) s"""["null", ${avroType(f.dataType)}]"""
        else avroType(f.dataType)
      val dflt = if (f.nullable) ""","default":null""" else ""
      s"""{"name":"${f.name}","type":$t$dflt}"""
    }
    s"""{"type":"record","name":"graft_row","fields":[${fields.mkString(",")}]}"""
  }

  /** Distributed OCF writer: each task writes `part-<partition>.avro`
    * under `outDir` (deflate-coded). Same Hadoop-FS sink discipline as
    * [[TarShards.writeShards]]: scheme resolved from the path, the
    * driver's Hadoop conf ships via its Writable round-trip.
    *
    * Commit protocol (task-level temp + rename): each attempt streams to
    * a unique `part-<pid>.avro.tmp-<uuid>` and renames to the final
    * `part-<pid>.avro` only AFTER a successful container close — so a
    * task that dies mid-write leaves only a temp file that [[read]]'s
    * `*.avro` glob never sees (no silent prefix-truncation), a
    * speculative duplicate attempt never interleaves bytes into the
    * final name (each attempt owns its uuid temp; first rename wins,
    * the loser deletes its temp), and sequential retries stay
    * idempotent (existing final part is replaced atomically-enough via
    * delete-then-rename of a fully-written container). Stale temp files
    * from dead attempts are swept by the pre-job cleanup. */
  def write(df: DataFrame, outDir: String): Unit = {
    val spark = df.sparkSession
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    val schema = df.schema
    val schemaJson = avroSchemaJson(schema)
    // fail fast ON THE DRIVER for both unsupported types (avroType
    // throws inside avroSchemaJson) and Avro-invalid field names — the
    // JSON is hand-built from unvalidated Spark column names, and
    // without this parse a name like "n-chars" (or one with a quote)
    // would surface as a distributed task failure after job launch
    new org.apache.avro.Schema.Parser().parse(schemaJson)
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val out = new Path(outDir)
    val fs = out.getFileSystem(hadoopConf)
    fs.mkdirs(out)
    Option(fs.globStatus(new Path(out, "*.avro")))
      .foreach(_.foreach(s => fs.delete(s.getPath, false)))
    // sweep temp files abandoned by dead attempts of a previous job
    Option(fs.globStatus(new Path(out, "*.avro.tmp-*")))
      .foreach(_.foreach(s => fs.delete(s.getPath, false)))
    val confBytes = {
      val baos = new java.io.ByteArrayOutputStream()
      val dos = new java.io.DataOutputStream(baos)
      hadoopConf.write(dos); dos.close(); baos.toByteArray
    }
    val outUri = fs.makeQualified(out).toString
    val n = schema.length
    df.queryExecution.toRdd.mapPartitionsWithIndex { (pid, rows) =>
      // InternalRow -> GenericRecord without a driver round-trip
      val avroSchema = new org.apache.avro.Schema.Parser().parse(schemaJson)
      val conf = new Configuration(false)
      conf.readFields(new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(confBytes)))
      val p = new Path(outUri, f"part-$pid%05d.avro")
      // unique per-ATTEMPT temp: concurrent speculative attempts each
      // own their temp file, and only a fully-closed container is ever
      // renamed to the final *.avro name the read glob sees
      val tmp = new Path(outUri,
        f"part-$pid%05d.avro.tmp-${java.util.UUID.randomUUID()}")
      val pfs = p.getFileSystem(conf)
      val os = pfs.create(tmp, true)
      val writer = new org.apache.avro.file.DataFileWriter(
        new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](avroSchema))
      writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
      writer.create(avroSchema, os)
      var count = 0L
      var committed = false
      try {
        rows.foreach { ir =>
          val rec =
            new org.apache.avro.generic.GenericData.Record(avroSchema)
          var i = 0
          while (i < n) {
            val v: AnyRef =
              if (ir.isNullAt(i)) null
              else schema(i).dataType match {
                case LongType => java.lang.Long.valueOf(ir.getLong(i))
                case IntegerType => java.lang.Integer.valueOf(ir.getInt(i))
                case DoubleType => java.lang.Double.valueOf(ir.getDouble(i))
                case FloatType => java.lang.Float.valueOf(ir.getFloat(i))
                case BooleanType =>
                  java.lang.Boolean.valueOf(ir.getBoolean(i))
                case StringType => ir.getUTF8String(i).toString
                case BinaryType => java.nio.ByteBuffer.wrap(ir.getBinary(i))
                case other => throw new IllegalStateException(other.toString)
              }
            rec.put(i, v)
            i += 1
          }
          writer.append(rec)
          count += 1
        }
        writer.close() // closes the FS stream too; container now complete
        // commit: replace any prior final part (sequential retry), then
        // rename. A false rename with the final part present means a
        // concurrent attempt won the race — drop our temp and succeed.
        if (pfs.exists(p)) pfs.delete(p, false)
        if (!pfs.rename(tmp, p)) {
          if (pfs.exists(p)) pfs.delete(tmp, false)
          else throw new java.io.IOException(
            s"AvroFiles.write: rename $tmp -> $p failed")
        }
        committed = true
      } finally {
        if (!committed) {
          try writer.close() catch { case _: Throwable => () }
          try pfs.delete(tmp, false) catch { case _: Throwable => () }
        }
      }
      Iterator.single(count)
    }.count() // materialize the write
    ()
  }

  /** Read every `*.avro` container under `path` into `schema` + an
    * `error` column (null on good rows): field resolution by name, a
    * structurally corrupt container yields ONE quarantine row (all data
    * columns null, `error` set) rather than a task failure — the
    * [[TarShards.members]] posture. Rows decoded before the corruption
    * point are kept (their bytes were valid). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    // every data field reads as NULLABLE regardless of the caller's
    // flags: quarantine rows and by-name misses are all-null by
    // construction, and a non-nullable field would make the row encoder
    // throw on exactly the hostile input the quarantine exists to absorb
    // (caught by AvroFuzzSpec)
    val out = StructType(schema.fields.map(_.copy(nullable = true)) :+
      StructField("error", StringType, nullable = true))
    val fieldNames = schema.fields.map(_.name)
    val fieldTypes = schema.fields.map(_.dataType)
    val rdd = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro").load(path)
      .select(col("path"), col("content"))
      .rdd
      .flatMap { fileRow =>
        val bytes = fileRow.getAs[Array[Byte]]("content")
        val rows = Vector.newBuilder[Row]
        try {
          val stream = new org.apache.avro.file.DataFileStream(
            new java.io.ByteArrayInputStream(bytes),
            new org.apache.avro.generic.GenericDatumReader[
              org.apache.avro.generic.GenericRecord]())
          try {
            // by-name resolution against the container's writer schema,
            // positions cached once per file
            val pos = fieldNames.map { n =>
              Option(stream.getSchema.getField(n)).map(_.pos()).getOrElse(-1)
            }
            while (stream.hasNext) {
              val rec = stream.next()
              val vals = new Array[Any](fieldNames.length + 1)
              var i = 0
              while (i < fieldNames.length) {
                val raw = if (pos(i) < 0) null else rec.get(pos(i))
                vals(i) = (raw, fieldTypes(i)) match {
                  case (null, _) => null
                  case (u: org.apache.avro.util.Utf8, StringType) =>
                    u.toString
                  case (s: String, StringType) => s
                  case (b: java.nio.ByteBuffer, BinaryType) =>
                    val a = new Array[Byte](b.remaining()); b.get(a); a
                  case (v: java.lang.Long, LongType) => v.longValue()
                  case (v: java.lang.Integer, IntegerType) => v.intValue()
                  // widened by-name evolution: int containers read as long
                  case (v: java.lang.Integer, LongType) => v.longValue()
                  case (v: java.lang.Double, DoubleType) => v.doubleValue()
                  case (v: java.lang.Float, FloatType) => v.floatValue()
                  case (v: java.lang.Float, DoubleType) => v.doubleValue()
                  case (v: java.lang.Boolean, BooleanType) => v.booleanValue()
                  case (other, want) => throw new IllegalArgumentException(
                    s"field ${fieldNames(i)}: container value " +
                      s"${other.getClass.getSimpleName} does not read as $want")
                }
                i += 1
              }
              vals(fieldNames.length) = null // error column
              rows += Row.fromSeq(vals.toSeq)
            }
          } finally stream.close()
          rows.result()
        } catch {
          case scala.util.control.NonFatal(e) =>
            val kept = rows.result()
            val quarantine = Row.fromSeq(
              Seq.fill[Any](fieldNames.length)(null) :+
                s"avro walk failed: ${String.valueOf(e.getMessage).take(200)}")
            kept :+ quarantine
        }
      }
    spark.createDataFrame(rdd, out)
  }
}
