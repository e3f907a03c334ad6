package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Avro object-container interop built directly on the PUBLIC Avro Hadoop
  * APIs (avro + avro-mapred ship with Spark's jars; the separate spark-avro
  * datasource does not, and this sandbox has no resolver) — so a user whose
  * existing pipelines land Avro files can scan them, and stage results back
  * out, without new dependencies.
  *
  * Scope: flat records of Avro primitives (string/int/long/float/double/
  * boolean/bytes, plus nullable unions of those) and the date /
  * timestamp-micros logical types — the KV/tabular shapes the reference's
  * container formats carry. Nested records belong to parquet, the engine's
  * canonical format.
  */
object Avro {

  private def toSparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.STRING  => StringType
    case Schema.Type.INT
      if s.getLogicalType.isInstanceOf[org.apache.avro.LogicalTypes.Date] =>
      DateType
    case Schema.Type.INT     => IntegerType
    case Schema.Type.LONG
      if s.getLogicalType.isInstanceOf[org.apache.avro.LogicalTypes.TimestampMicros] =>
      TimestampType
    case Schema.Type.LONG    => LongType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES   => BinaryType
    case Schema.Type.UNION => // nullable primitive: [null, T] or [T, null]
      val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(branches.size == 1, s"unsupported union $s")
      toSparkType(branches.head)
    case other => throw new IllegalArgumentException(
      s"unsupported avro type $other (flat primitives only; use parquet)")
  }

  private def toAvroSchema(schema: StructType, name: String): Schema = {
    val fields = schema.fields.map { f =>
      val t = f.dataType match {
        case StringType  => Schema.create(Schema.Type.STRING)
        case IntegerType => Schema.create(Schema.Type.INT)
        case LongType    => Schema.create(Schema.Type.LONG)
        case FloatType   => Schema.create(Schema.Type.FLOAT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case BinaryType  => Schema.create(Schema.Type.BYTES)
        case TimestampType => org.apache.avro.LogicalTypes.timestampMicros()
          .addToSchema(Schema.create(Schema.Type.LONG))
        case DateType => org.apache.avro.LogicalTypes.date()
          .addToSchema(Schema.create(Schema.Type.INT))
        case other => throw new IllegalArgumentException(
          s"unsupported spark type $other for avro (flat primitives only)")
      }
      val withNull = if (f.nullable)
        Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), t))
      else t
      new Schema.Field(f.name, withNull, null, null)
    }
    Schema.createRecord(name, null, "graft", false, fields.toSeq.asJava)
  }

  /** Avro datum → Spark row value (Avro strings arrive as Utf8, bytes as
    * ByteBuffer — both must be converted INSIDE the scan, before any reuse). */
  private def decode(v: Any): Any = v match {
    case null                        => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case b: java.nio.ByteBuffer =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case other                       => other
  }

  private def unwrapUnion(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  /** Per-field decoder honoring logical types (timestamp-micros → SQL
    * Timestamp, date → SQL Date); plain fields fall through to [[decode]]. */
  private def decoderFor(s: Schema): Any => Any = {
    val base = unwrapUnion(s)
    base.getLogicalType match {
      case _: org.apache.avro.LogicalTypes.TimestampMicros => {
        case null => null
        case micros: java.lang.Long =>
          val t = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
          t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
          t
        case other => other
      }
      case _: org.apache.avro.LogicalTypes.Date => {
        case null => null
        case days: java.lang.Integer =>
          java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.longValue))
        case other => other
      }
      case _ => decode
    }
  }

  /** Per-field encoder: SQL Timestamp/Date → the logical-type storage ints.
    * floorDiv keeps pre-epoch instants exact (plain / truncates toward 0). */
  private def encodeValue(v: Any): Any = v match {
    case t: java.sql.Timestamp =>
      java.lang.Long.valueOf(
        Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L)
    case d: java.sql.Date => java.lang.Integer.valueOf(d.toLocalDate.toEpochDay.toInt)
    case b: Array[Byte]   => java.nio.ByteBuffer.wrap(b)
    case other            => other
  }

  /** Avro container glob → DataFrame. The column schema comes from the
    * files' own writer schema (read from the first matched container's
    * header); the scan itself is the splittable AvroKeyInputFormat, so big
    * containers split across tasks on sync markers like SequenceFiles. */
  def readAvro(spark: SparkSession, glob: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(glob).getFileSystem(conf)
    val first = Option(fs.globStatus(new Path(glob)))
      .getOrElse(Array.empty).filter(_.isFile)
      .headOption.getOrElse(
        throw new java.io.FileNotFoundException(s"no avro files match $glob"))
    val header = new org.apache.avro.file.DataFileStream(
      fs.open(first.getPath), new GenericDatumReader[GenericRecord]())
    val avroSchema = header.getSchema
    header.close()
    val sparkSchema = StructType(avroSchema.getFields.asScala.map(f =>
      StructField(f.name, toSparkType(f.schema), nullable = true)).toSeq)
    val names = avroSchema.getFields.asScala.map(_.name).toArray
    val schemaJson = avroSchema.toString
    val rows = spark.sparkContext.newAPIHadoopFile(
      glob,
      classOf[org.apache.avro.mapreduce.AvroKeyInputFormat[GenericRecord]],
      classOf[org.apache.avro.mapred.AvroKey[GenericRecord]],
      classOf[NullWritable])
      .mapPartitions { it =>
        val expected = new Schema.Parser().parse(schemaJson)
        val decoders = names.map(n => decoderFor(expected.getField(n).schema))
        // guard against heterogeneous writer schemas under one glob: a
        // field missing from another file would read as null and corrupt
        // silently. Records of one file share a Schema instance, so an
        // identity check per record costs nothing and validates each new
        // schema once.
        var seen: Schema = null
        it.map { case (k, _) =>
          val rec = k.datum()
          if (rec.getSchema ne seen) {
            seen = rec.getSchema
            val missing = names.filter(seen.getField(_) == null)
            require(missing.isEmpty,
              s"avro file schema lacks fields ${missing.mkString(",")} " +
                "present in the glob's first file — mixed writer schemas")
          }
          val vals = new Array[Any](names.length)
          var i = 0
          while (i < names.length) {
            vals(i) = decoders(i)(rec.get(names(i)))
            i += 1
          }
          Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
        }
      }
    spark.createDataFrame(rows, sparkSchema)
  }

  /** DataFrame → Avro container files, written DISTRIBUTED through
    * AvroKeyOutputFormat (one container per task, deflate-compressed) — the
    * staging path back into an Avro-consuming pipeline. */
  def writeAvro(df: DataFrame, path: String, recordName: String = "row"): Unit = {
    val spark = df.sparkSession
    val schema = toAvroSchema(df.schema, recordName)
    val schemaJson = schema.toString
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      spark.sparkContext.hadoopConfiguration)
    org.apache.avro.mapreduce.AvroJob.setOutputKeySchema(job, schema)
    // avro-mapred only honors avro.output.codec when the generic MR output
    // compression flag is ALSO set — without it the codec silently no-ops
    org.apache.hadoop.mapreduce.lib.output.FileOutputFormat
      .setCompressOutput(job, true)
    job.getConfiguration.set("avro.output.codec", "deflate")
    val names = df.schema.fieldNames
    df.rdd
      .mapPartitions { it =>
        // Schema is not serializable pre-1.9-style; re-parse per task
        val s = new Schema.Parser().parse(schemaJson)
        it.map { row =>
          val rec = new GenericData.Record(s)
          names.indices.foreach { i =>
            rec.put(names(i), encodeValue(row.get(i)))
          }
          (new org.apache.avro.mapred.AvroKey[GenericRecord](rec),
            NullWritable.get())
        }
      }
      .saveAsNewAPIHadoopFile(
        path,
        classOf[org.apache.avro.mapred.AvroKey[GenericRecord]],
        classOf[NullWritable],
        classOf[org.apache.avro.mapreduce.AvroKeyOutputFormat[GenericRecord]],
        job.getConfiguration)
  }
}
