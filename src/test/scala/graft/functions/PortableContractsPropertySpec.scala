package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Property guard for the shared portability contracts
  * ([[TextFunctions.portableBucket]] / [[TextFunctions.hashOrder]]): the
  * Spark expressions must equal an independent JVM MessageDigest
  * reference for arbitrary keys — the oracle SQL twins encode the same
  * definition, so this pins all three representations together. */
class PortableContractsPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def check(name: String, p: Prop, n: Int = 12): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, s"$name: $res")
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def refBucket(key: String, mod: Long): Long =
    java.lang.Long.parseLong(md5Hex(key).take(8), 16) % mod

  test("portableBucket == first-8-hex-of-md5 mod m, for arbitrary keys/mods") {
    val gen = for {
      ids <- Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
      mod <- Gen.oneOf(8L, 100L, 997L, 10000L)
    } yield (ids.distinct, mod)
    check("portableBucket", Prop.forAllNoShrink(gen) { case (ids, mod) =>
      val got = ids.toDF("id")
        .select(col("id"), TextFunctions.portableBucket(col("id"), mod).as("b"))
        .as[(Long, Long)].collect().toMap
      ids.forall(id => got(id) == refBucket(id.toString, mod))
    })
  }

  test("hashOrder sorts exactly like (md5 string, id) in the JVM") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(-100000L, 100000L)).map(_.distinct)
    check("hashOrder", Prop.forAllNoShrink(gen) { ids =>
      val got = ids.toDF("id")
        .orderBy(TextFunctions.hashOrder(col("id")): _*)
        .as[Long].collect().toSeq
      val want = ids.sortBy(id => (md5Hex(id.toString), id))
      got == want
    })
  }
}
