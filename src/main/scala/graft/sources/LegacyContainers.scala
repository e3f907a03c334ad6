package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{BloomMapFile, BooleanWritable, BytesWritable,
  DoubleWritable, FloatWritable, IntWritable, LongWritable, MapFile,
  NullWritable, SequenceFile, Text, Writable, WritableComparable}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Interop for the reference's sorted key-value containers
  * (reference: COMMON-IO io/MapFile.java:59, io/BloomMapFile.java:49,
  * io/file/tfile/TFile.java).
  *
  * Read side: a user with EXISTING MapFile/BloomMapFile/TFile data scans
  * it without a migration step. Write side ([[writeMapFile]]): a pipeline
  * that must hand data BACK to a legacy Hadoop consumer expecting
  * MapFile point lookups gets genuine containers — sorted data + index
  * (+ bloom) sidecars, one MapFile per range partition, exactly the
  * reference's one-per-reducer MapFileOutputFormat layout
  * (MR-CORE .../lib/output/MapFileOutputFormat.java:49). The engine's own
  * canonical storage stays parquet (stats + bucketing replace the
  * index/bloom sidecars — capability gates q_bucket_lookup and
  * q_bloom_join); TFile never shipped a public OutputFormat, so its write
  * path stays out.
  */
object LegacyContainers {

  /** Spark column type for a legacy Writable class (the K/V shapes the
    * reference's containers actually carry — e.g. the IntWritable values of
    * MR-JC-TEST mapreduce/lib/join/TestJoinDatamerge.java:59). */
  private def sparkType(cls: Class[_ <: Writable]): DataType = cls match {
    case c if c == classOf[Text]            => StringType
    case c if c == classOf[IntWritable]     => IntegerType
    case c if c == classOf[LongWritable]    => LongType
    case c if c == classOf[FloatWritable]   => FloatType
    case c if c == classOf[DoubleWritable]  => DoubleType
    case c if c == classOf[BooleanWritable] => BooleanType
    case c if c == classOf[BytesWritable]   => BinaryType
    case c if c == classOf[NullWritable]    => StringType // always-null col
    case other => throw new IllegalArgumentException(
      s"unsupported Writable class: ${other.getName}")
  }

  /** Writable → plain JVM value. MUST be applied inside the scan's own map
    * (before any shuffle/cache): Hadoop record readers REUSE the Writable
    * instance, so the bytes are only valid until the next record. */
  private def decode(w: Writable): Any = w match {
    case t: Text            => t.toString
    case i: IntWritable     => i.get
    case l: LongWritable    => l.get
    case f: FloatWritable   => f.get
    case d: DoubleWritable  => d.get
    case b: BooleanWritable => b.get
    case b: BytesWritable   => java.util.Arrays.copyOf(b.getBytes, b.getLength)
    case _: NullWritable    => null
    case other              => other.toString
  }

  /** SequenceFile path/glob → DataFrame(key, value) with column types
    * derived from the declared Writable classes (default Text/Text). Rides
    * Spark's splittable SequenceFile scan — at 100 TB each container splits
    * across tasks like any other SequenceFile. */
  def readSequence(
      spark: SparkSession,
      path: String,
      keyClass: Class[_ <: Writable] = classOf[Text],
      valueClass: Class[_ <: Writable] = classOf[Text]): DataFrame = {
    val rdd = spark.sparkContext
      .hadoopFile(
        path,
        classOf[org.apache.hadoop.mapred.SequenceFileInputFormat[Writable, Writable]],
        keyClass.asInstanceOf[Class[Writable]],
        valueClass.asInstanceOf[Class[Writable]])
      .map { case (k, v) => Row(decode(k), decode(v)) }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("key", sparkType(keyClass), nullable = true),
      StructField("value", sparkType(valueClass), nullable = true))))
  }

  /** MapFile/BloomMapFile directory → DataFrame(key, value).
    *
    * A MapFile is a directory whose `data` member IS a sorted SequenceFile;
    * `index` (and BloomMapFile's `bloom`) are lookup sidecars. The scan
    * therefore rides Spark's ordinary SPLITTABLE SequenceFile path over
    * `data` and ignores the sidecars — at 100 TB each container splits
    * across tasks like any other SequenceFile, and point lookups belong to
    * the bucketed-parquet path, not this one. K/V Writable classes are
    * parameterized exactly as [[readSequence]]'s. */
  def readMapFile(
      spark: SparkSession,
      dir: String,
      keyClass: Class[_ <: Writable] = classOf[Text],
      valueClass: Class[_ <: Writable] = classOf[Text]): DataFrame =
    readSequence(spark, s"$dir/data", keyClass, valueClass)

  /** Plain JVM value → Writable of the declared class (inverse of
    * [[decode]]). Fresh instance per call; null values map to the type's
    * empty/zero (MapFile values cannot be null on the wire). */
  private def encode(cls: Class[_ <: Writable], v: Any): Writable = cls match {
    case c if c == classOf[Text] =>
      new Text(if (v == null) "" else v.toString)
    case c if c == classOf[IntWritable] =>
      new IntWritable(if (v == null) 0 else v.asInstanceOf[Int])
    case c if c == classOf[LongWritable] =>
      new LongWritable(if (v == null) 0L else v.asInstanceOf[Long])
    case c if c == classOf[FloatWritable] =>
      new FloatWritable(if (v == null) 0f else v.asInstanceOf[Float])
    case c if c == classOf[DoubleWritable] =>
      new DoubleWritable(if (v == null) 0d else v.asInstanceOf[Double])
    case c if c == classOf[BooleanWritable] =>
      new BooleanWritable(v != null && v.asInstanceOf[Boolean])
    case c if c == classOf[BytesWritable] =>
      new BytesWritable(
        if (v == null) Array.emptyByteArray else v.asInstanceOf[Array[Byte]])
    case c if c == classOf[NullWritable] => NullWritable.get()
    case other => throw new IllegalArgumentException(
      s"unsupported Writable class: ${other.getName}")
  }

  /** Distributed MapFile/BloomMapFile WRITE: `df`'s first two columns
    * become (key, value); rows are RANGE-partitioned and locally sorted
    * on the key (MapFile's sorted-append contract), and each partition
    * writes one genuine container `part-r-%05d/` via the Hadoop
    * `MapFile.Writer` (data + index sidecars; `BloomMapFile.Writer` adds
    * the bloom sidecar when `bloom`). The directory layout and global
    * key order are exactly the reference's MapFileOutputFormat-with-
    * TotalOrderPartitioner shape, so a legacy consumer can
    * `getEntry`/`get` against the parts — and at 100 TB the write is one
    * range shuffle plus embarrassingly-parallel container appends.
    * Read it back with `readMapFile(spark, s"$dir/part-r-*")`.
    *
    * Output commit protocol (the FileOutputCommitter v1 shape the
    * reference's committers implement — reference: hadoop-mapreduce-
    * client-core .../lib/output/FileOutputCommitter.java:42): each task
    * ATTEMPT writes its container under `dir/_temporary/<job>/<attempt>/`,
    * so a speculative duplicate or a retried task can never interleave
    * with another writer on the final path; after the job succeeds the
    * DRIVER promotes exactly one attempt per partition into
    * `part-r-%05d` (single-threaded — no commit race) and deletes the
    * temp tree. A failed job's attempt tree is deleted on the way out
    * (the job run and the commit loop share one cleanup `finally`), so
    * neither a crash mid-job nor mid-commit leaves partial output visible
    * to the `part-r-*` read glob or litters the output dir. */
  def writeMapFile(
      df: DataFrame, dir: String,
      keyClass: Class[_ <: Writable] = classOf[Text],
      valueClass: Class[_ <: Writable] = classOf[Text],
      bloom: Boolean = false): Unit = {
    require(df.columns.length == 2,
      s"need exactly (key, value) columns, got ${df.columns.toSeq}")
    require(classOf[WritableComparable[_]].isAssignableFrom(keyClass),
      s"MapFile keys must be WritableComparable: ${keyClass.getName}")
    val sconf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val keyCol = org.apache.spark.sql.functions.col(df.columns(0))
    val sorted = df.repartitionByRange(keyCol).sortWithinPartitions(keyCol)
    val jobId = java.util.UUID.randomUUID().toString
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val outDir = new Path(dir)
    val fs = outDir.getFileSystem(conf)
    // the job run AND the commit loop share this try: a job that throws
    // (task failure exhausting retries) must not leak its attempt tree
    // under _temporary/<jobId> any more than a failed commit would
    try {
      val attempts = sorted.rdd.mapPartitionsWithIndex { case (i, it) =>
        val conf = sconf.value
        val ctx = org.apache.spark.TaskContext.get()
        val attemptDir = new Path(dir,
          s"_temporary/$jobId/attempt_${ctx.stageId()}_${i}_${ctx.taskAttemptId()}")
        val part = new Path(attemptDir, f"part-r-$i%05d")
        val kc = keyClass.asInstanceOf[Class[_ <: WritableComparable[_]]]
        val writer =
          if (bloom)
            new BloomMapFile.Writer(conf, part,
              MapFile.Writer.keyClass(kc),
              SequenceFile.Writer.valueClass(valueClass))
          else
            new MapFile.Writer(conf, part,
              MapFile.Writer.keyClass(kc),
              SequenceFile.Writer.valueClass(valueClass))
        try it.foreach { row =>
          writer.append(
            encode(keyClass, row.get(0)).asInstanceOf[WritableComparable[_]],
            encode(valueClass, row.get(1)))
        } finally writer.close()
        Iterator.single((i, part.toString))
      }.collect()
      // driver-side commit: one winner per partition (a speculative or
      // retried attempt that also finished is simply never promoted)
      attempts.groupBy(_._1).foreach { case (i, as) =>
        val src = new Path(as.head._2)
        val dst = new Path(outDir, f"part-r-$i%05d")
        if (fs.exists(dst)) fs.delete(dst, true)
        if (!fs.rename(src, dst))
          throw new java.io.IOException(
            s"writeMapFile: commit rename failed: $src -> $dst")
      }
    } finally {
      fs.delete(new Path(outDir, s"_temporary/$jobId"), true)
      // remove _temporary entirely when no other concurrent job owns it
      val tmpRoot = new Path(outDir, "_temporary")
      if (fs.exists(tmpRoot) && fs.listStatus(tmpRoot).isEmpty)
        fs.delete(tmpRoot, true)
    }
  }

  /** TFile glob → DataFrame(key, value), keys/values decoded as UTF-8.
    *
    * TFile never shipped a public InputFormat, so each matched file is
    * scanned whole by one task (files parallelize across the cluster; a
    * single container does not split). That is the right shape for what
    * TFile reads are — one-shot migration/ingest of legacy data — and a
    * deliberate non-goal for query workloads: re-land as parquet first.
    * Entries STREAM through a lazy iterator (reader closed on exhaustion),
    * so a multi-GB container never materializes in a task's heap. */
  def readTFile(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    val sconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fs = new Path(glob).getFileSystem(sconf.value)
    // globStatus returns NULL (not empty) for a non-matching literal path
    val files = Option(fs.globStatus(new Path(glob)))
      .getOrElse(Array.empty)
      .filter(_.isFile)
      .map(st => (st.getPath.toString, st.getLen))
      .toSeq
    spark.sparkContext
      .parallelize(files, math.max(1, files.length))
      .flatMap { case (p, len) =>
        val itr = new TFileIterator(p, len, sconf.value)
        // an early-terminating consumer (limit/take) never exhausts the
        // iterator, so also release the reader at task completion
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => itr.close()))
        itr
      }
      .toDF("key", "value")
  }

  /** Lazy one-pass scanner over a single TFile: entries decode on demand
    * and the reader closes on exhaustion (or task completion), so the task
    * heap holds one entry at a time, never the container. */
  private final class TFileIterator(
      p: String, len: Long, conf: org.apache.hadoop.conf.Configuration)
      extends Iterator[(String, String)] {
    private val path = new Path(p)
    private val in = path.getFileSystem(conf).open(path)
    private val reader =
      new org.apache.hadoop.io.file.tfile.TFile.Reader(in, len, conf)
    private val scanner = reader.createScanner()
    private var closed = false

    def close(): Unit = if (!closed) {
      closed = true
      scanner.close(); reader.close(); in.close()
    }
    override def hasNext: Boolean = {
      if (!closed && scanner.atEnd()) close()
      !closed
    }
    override def next(): (String, String) = {
      if (!hasNext) throw new NoSuchElementException("TFile exhausted")
      val e = scanner.entry()
      val k = new Array[Byte](e.getKeyLength)
      e.getKey(k)
      val v = new Array[Byte](e.getValueLength)
      e.getValue(v)
      scanner.advance()
      (new String(k, "UTF-8"), new String(v, "UTF-8"))
    }
  }
}
