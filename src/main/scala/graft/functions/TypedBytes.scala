package graft.functions

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream,
  DataOutputStream, EOFException}
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.StructType

/** Typed-bytes wire protocol — Hadoop Streaming's binary record framing
  * (reference: hadoop-tools/hadoop-streaming/.../typedbytes/Type.java,
  * TypedBytesInput.java:46, TypedBytesOutput.java), byte-for-byte: every
  * value is one unsigned type-tag byte followed by a big-endian payload
  * (bytes 0: i32 length + raw; byte 1; bool 2; int 3: i32; long 4: i64;
  * float 5; double 6; string 7: i32 length + UTF-8; vector 8: i32 count +
  * tagged elements). Unlike [[graft.operators.PipeOps.pipeMapBinary]]'s
  * base64 framing (capability-equivalent, line-oriented), this stream IS
  * the reference wire format: an existing `-io typedbytes` executable
  * consumes and produces it unchanged.
  *
  * [[pipe]] is the record-stream transport: one external process per
  * partition (the reference's economics — one per task), a daemon writer
  * thread feeding stdin so neither side ever deadlocks on a full OS pipe
  * buffer, rows read back as fixed-arity value groups. Fully distributed:
  * nothing driver-side but the plan. Nulls are not representable in the
  * wire format (same as the reference) — pre-coalesce them. */
object TypedBytes {

  def writeValue(out: DataOutputStream, v: Any): Unit = v match {
    case b: Array[Byte] => out.writeByte(0); out.writeInt(b.length); out.write(b)
    case b: Byte        => out.writeByte(1); out.writeByte(b.toInt)
    case b: Boolean     => out.writeByte(2); out.writeBoolean(b)
    case i: Int         => out.writeByte(3); out.writeInt(i)
    case l: Long        => out.writeByte(4); out.writeLong(l)
    case f: Float       => out.writeByte(5); out.writeFloat(f)
    case d: Double      => out.writeByte(6); out.writeDouble(d)
    case s: String =>
      val b = s.getBytes(UTF_8)
      out.writeByte(7); out.writeInt(b.length); out.write(b)
    case seq: Seq[_] =>
      out.writeByte(8); out.writeInt(seq.length)
      seq.foreach(writeValue(out, _))
    case other =>
      sys.error(s"typed-bytes cannot frame ${if (other == null) "null"
        else other.getClass.getName} (nulls and nested structs unsupported)")
  }

  /** One tagged value; throws EOFException exactly at a clean stream end
    * (EOF mid-value means a corrupt stream and surfaces as-is). */
  def readValue(in: DataInputStream): Any = {
    val tag = in.read()
    if (tag == -1) throw new EOFException("end of typed-bytes stream")
    tag match {
      case 0 =>
        val buf = new Array[Byte](in.readInt()); in.readFully(buf); buf
      case 1 => in.readByte()
      case 2 => in.readBoolean()
      case 3 => in.readInt()
      case 4 => in.readLong()
      case 5 => in.readFloat()
      case 6 => in.readDouble()
      case 7 =>
        val buf = new Array[Byte](in.readInt()); in.readFully(buf)
        new String(buf, UTF_8)
      case 8 =>
        val n = in.readInt()
        Vector.fill(n)(readValue(in))
      case other => sys.error(s"unsupported typed-bytes tag $other")
    }
  }

  /** Pipe `df` through `cmd` speaking typed-bytes on both stdin and
    * stdout: each input row is written as its columns' tagged values in
    * order; the command's stdout is decoded as consecutive value groups of
    * `outSchema`'s arity. The command's stderr passes through to the task
    * log; a non-zero exit fails the task (the reference's failing-mapper
    * contract). */
  def pipe(df: DataFrame, cmd: Seq[String], outSchema: StructType,
      env: Map[String, String] = Map.empty): DataFrame = {
    val spark = df.sparkSession
    val nOut = outSchema.fields.length
    require(nOut > 0, "outSchema must have at least one column")
    val rdd = df.rdd.mapPartitions { rows =>
      val pb = new ProcessBuilder(cmd: _*)
      env.foreach { case (k, v) => pb.environment().put(k, v) }
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val proc = pb.start()
      val out = new DataOutputStream(
        new BufferedOutputStream(proc.getOutputStream, 64 * 1024))
      val writer = new Thread(() => {
        try {
          rows.foreach { r =>
            var i = 0
            while (i < r.length) { writeValue(out, r.get(i)); i += 1 }
          }
          out.flush(); out.close()
        } catch { case _: java.io.IOException => () } // consumer exited early
      }, "typed-bytes-writer")
      writer.setDaemon(true)
      writer.start()
      val in = new DataInputStream(
        new BufferedInputStream(proc.getInputStream, 64 * 1024))
      new Iterator[Row] {
        private var pending: Row = null
        private var done = false
        private def advance(): Unit = if (pending == null && !done) {
          val first =
            try Some(readValue(in))
            catch { case _: EOFException => None }
          first match {
            case None =>
              done = true
              in.close()
              val rc = proc.waitFor()
              writer.join()
              require(rc == 0, s"pipe command ${cmd.mkString(" ")} failed: rc=$rc")
            case Some(v0) =>
              pending = Row.fromSeq(v0 +: Seq.fill(nOut - 1)(readValue(in)))
          }
        }
        override def hasNext: Boolean = { advance(); pending != null }
        override def next(): Row = {
          advance()
          if (pending == null) throw new NoSuchElementException
          val r = pending; pending = null; r
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
