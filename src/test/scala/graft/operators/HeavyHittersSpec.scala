package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Misra–Gries heavy-hitter contract: the two-pass result equals the exact
  * full GROUP BY answer (no false positives OR negatives), under capacities
  * small enough that the sketch decrements constantly. */
class HeavyHittersSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def exact(keys: Seq[String], k: Int): Map[String, Long] = {
    val n = keys.length
    keys.groupBy(identity).view.mapValues(_.length.toLong)
      .filter { case (_, f) => f * k > n }.toMap
  }

  test("matches the exact answer on a skewed stream with adversarial tail") {
    // 2 genuine heavy keys drowned in 400 distinct tail keys, shuffled so
    // heavy occurrences interleave with tail floods (worst case for MG),
    // split across 8 partitions
    val rnd = new scala.util.Random(11)
    val keys = rnd.shuffle(
      Seq.fill(300)("hot1") ++ Seq.fill(150)("hot2") ++
        (1 to 400).flatMap(i => Seq.fill(2)(s"tail$i")))
    val df = spark.sparkContext.parallelize(keys, 8).toDF("k")
    val got = AggOps.heavyHitters(df, col("k"), k = 10)
      .as[(String, Long)].collect().toMap
    assert(got == exact(keys, 10))
    assert(got.keySet == Set("hot1", "hot2"))
  }

  test("boundary frequency (freq * k == n) is excluded, strictly-above kept") {
    // n = 20, k = 4 → threshold n/k = 5: "edge" at exactly 5 must NOT
    // qualify (strict >), "in" at 6 must
    val keys = Seq.fill(5)("edge") ++ Seq.fill(6)("in") ++
      (1 to 9).map(i => s"t$i")
    val df = spark.sparkContext.parallelize(keys, 3).toDF("k")
    val got = AggOps.heavyHitters(df, col("k"), k = 4)
      .as[(String, Long)].collect().toMap
    assert(got == Map("in" -> 6L))
  }

  test("null keys dilute n but are never reported") {
    val df = (Seq.fill(6)(Some("a")) ++ Seq.fill(10)(None: Option[String]))
      .toDF("k")
    // n = 16 incl. nulls, k = 3 → threshold 5.33: a (6) qualifies
    val got = AggOps.heavyHitters(df, col("k"), k = 3)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 6L))
    // k = 2 → threshold 8: nothing qualifies once nulls dilute
    assert(AggOps.heavyHitters(df, col("k"), k = 2).isEmpty)
  }
}
