package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream,
  DataOutputStream}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.TestSpark

class TypedBytesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def enc(v: Any): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    TypedBytes.writeValue(out, v)
    out.flush(); bos.toByteArray
  }
  private def dec(b: Array[Byte]): Any =
    TypedBytes.readValue(new DataInputStream(new ByteArrayInputStream(b)))

  test("wire layout is pinned to the reference spec (tag + big-endian payload)") {
    assert(enc("ab").toSeq === Seq[Byte](7, 0, 0, 0, 2, 97, 98))
    assert(enc(5L).toSeq === Seq[Byte](4, 0, 0, 0, 0, 0, 0, 0, 5))
    assert(enc(-1).toSeq === Seq[Byte](3, -1, -1, -1, -1))
    assert(enc(true).toSeq === Seq[Byte](2, 1))
    assert(enc(Array[Byte](9, 10)).toSeq === Seq[Byte](0, 0, 0, 0, 2, 9, 10))
    // 1.0d = 0x3FF0000000000000 big-endian
    assert(enc(1.0d).toSeq === Seq[Byte](6, 0x3f, -0x10, 0, 0, 0, 0, 0, 0))
    // vector of (long 1, string "x"): tag 8, count, then tagged elements
    assert(enc(Vector(1L, "x")).toSeq ===
      Seq[Byte](8, 0, 0, 0, 2, 4, 0, 0, 0, 0, 0, 0, 0, 1, 7, 0, 0, 0, 1, 120))
  }

  test("every scalar round-trips, including unicode, empty, and extreme values") {
    val vals: Seq[Any] = Seq("", "é中\tnew\nline", Long.MinValue, -0.0d,
      Double.MaxValue, 3.5f, false, Int.MinValue, Vector(1L, 2L))
    vals.foreach { v =>
      (v, dec(enc(v))) match {
        case (a: Array[Byte], b: Array[Byte]) => assert(a.toSeq === b.toSeq)
        case (a, b) => assert(a === b, s"round-trip failed for $v")
      }
    }
    assert(dec(enc(Array[Byte](0, 1, 2))).asInstanceOf[Array[Byte]].toSeq
      === Seq[Byte](0, 1, 2))
  }

  test("pipe through cat returns the exact input rows (binary-safe, unicode-safe)") {
    val df = Seq(
      (1L, "plain"),
      (2L, "tab\tand\nnewline"),
      (3L, "é中文🎈"),
      (4L, "")).toDF("id", "text")
    val out = TypedBytes.pipe(df, Seq("cat"),
      StructType.fromDDL("id LONG, text STRING"))
    assert(out.as[(Long, String)].collect().sortBy(_._1).toSeq
      === Seq((1L, "plain"), (2L, "tab\tand\nnewline"), (3L, "é中文🎈"), (4L, "")))
  }

  test("pipe fails the task when the command exits non-zero") {
    val df = Seq((1L, "x")).toDF("id", "text")
    val ex = intercept[Exception] {
      TypedBytes.pipe(df, Seq("false"),
        StructType.fromDDL("id LONG, text STRING")).collect()
    }
    assert(ex.getMessage != null)
  }
}
