package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions.col
import graft.TestSpark

/** Property tests: the Column-compiled spec languages agree with plain
  * Scala reference evaluators on random specs + random data — the
  * cross-check that the expression compilation (1-based element_at, slice
  * arithmetic, open ranges, numeric/reverse flags) is faithful. */
class SpecParserPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def check(name: String, p: Prop, n: Int = 30): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, s"$name: $res")
  }

  // ---- FieldSelection ------------------------------------------------------

  private def evalSel(fields: Vector[String], sels: Seq[FieldSelection.Sel]): String = {
    import FieldSelection._
    sels.flatMap {
      case Single(i)    => if (i < fields.length) Seq(fields(i)) else Seq(null)
      case Range(a, b)  => fields.slice(a, b + 1)
      case OpenRange(a) => fields.drop(a)
    }.filter(_ != null).mkString("-")
  }

  private val genSel: Gen[FieldSelection.Sel] = Gen.oneOf(
    Gen.choose(0, 5).map(FieldSelection.Single),
    for { a <- Gen.choose(0, 4); b <- Gen.choose(a, 5) }
      yield FieldSelection.Range(a, b),
    Gen.choose(0, 5).map(FieldSelection.OpenRange))

  private def selToString(s: FieldSelection.Sel): String = s match {
    case FieldSelection.Single(i)    => i.toString
    case FieldSelection.Range(a, b)  => s"$a-$b"
    case FieldSelection.OpenRange(a) => s"$a-"
  }

  test("field selection column compilation == reference evaluator") {
    val genCase = for {
      keySels <- Gen.nonEmptyListOf(genSel).map(_.take(4))
      valSels <- Gen.nonEmptyListOf(genSel).map(_.take(4))
      nFields <- Gen.choose(1, 8)
      fields <- Gen.listOfN(nFields, Gen.alphaLowerStr.map(_.take(3) + "x"))
    } yield (keySels, valSels, fields.toVector)
    check("fieldsel", Prop.forAll(genCase) { case (ks, vs, fields) =>
      val spec = ks.map(selToString).mkString(",") + ":" +
        vs.map(selToString).mkString(",")
      val line = fields.mkString("-")
      val (k, v) = FieldSelection.select(col("line"), spec, "-")
      val row = Seq(line).toDF("line").select(k.as("k"), v.as("v")).head()
      row.getString(0) == evalSel(fields, ks) &&
        row.getString(1) == evalSel(fields, vs)
    })
  }

  // ---- KeyFieldSpec --------------------------------------------------------

  test("-k sort spec compilation == reference comparator") {
    val genRow = for {
      a <- Gen.oneOf("1", "2", "10", "9", "100")
      b <- Gen.oneOf("x", "y", "z")
    } yield (a, b)
    val genCase = for {
      rows <- Gen.listOfN(12, genRow)
      numeric <- Gen.oneOf(true, false)
      reverse <- Gen.oneOf(true, false)
    } yield (rows, numeric, reverse)
    check("keyfield", Prop.forAll(genCase) { case (rows, numeric, reverse) =>
      val flags = (if (numeric) "n" else "") + (if (reverse) "r" else "")
      val spec = s"-k1,1$flags -k2,2"
      val indexed = rows.zipWithIndex.map { case ((a, b), i) => (a, b, i.toLong) }
      val got = indexed.toDF("f1", "f2", "idx")
        .orderBy(KeyFieldSpec.orderColumnsNamed(
          Seq(col("f1"), col("f2")), spec) :+ col("idx").asc: _*)
        .select("idx").as[Long].collect().toSeq
      val want = indexed.sortWith { case ((a1, b1, i1), (a2, b2, i2)) =>
        val c1 =
          if (numeric) {
            val d = a1.toDouble.compareTo(a2.toDouble)
            if (reverse) -d else d
          } else {
            val d = a1.compareTo(a2)
            if (reverse) -d else d
          }
        if (c1 != 0) c1 < 0
        else {
          val c2 = b1.compareTo(b2)
          if (c2 != 0) c2 < 0 else i1 < i2
        }
      }.map(_._3)
      got == want
    })
  }
}
