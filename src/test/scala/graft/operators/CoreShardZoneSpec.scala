package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.TextFunctions

/** k-core peel, rendezvous sharding, zone maps, SCD2 as-of snapshot —
  * hand-checkable fixtures. */
class CoreShardZoneSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("kCore: a triangle with tails keeps only the 2-core triangle") {
    // triangle 1-2-3, tails 3-4, 4-5: k=2 peels 5 then 4
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val out = GraphOps.kCore(edges, k = 2, rounds = 5)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: bounded rounds leave the not-yet-peeled shell") {
    // chain 1-2-3-4-5 with k=2: round 1 drops 1 and 5, round 2 drops
    // 2 and 4, round 3 drops 3 -> after 1 round the inner chain remains
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val after1 = GraphOps.kCore(edges, k = 2, rounds = 1)
      .select("n").as[Long].collect().toSet
    assert(after1 === Set(2L, 3L, 4L))
    val after3 = GraphOps.kCore(edges, k = 2, rounds = 3).count()
    assert(after3 === 0L, "the chain has no 2-core")
  }

  test("rendezvousShard: in-range, deterministic, and minimally moving") {
    val keys = (1L to 200L).toDF("k")
    val out = keys.select(col("k"),
        TextFunctions.rendezvousShard(col("k"), 8).as("s8"),
        TextFunctions.rendezvousShard(col("k"), 9).as("s9"))
      .as[(Long, Int, Int)].collect()
    assert(out.forall { case (_, s8, s9) => s8 >= 0 && s8 < 8 && s9 >= 0 && s9 < 9 })
    // growing 8 -> 9 shards only ever moves keys INTO the new shard 8
    assert(out.forall { case (_, s8, s9) => s8 == s9 || s9 == 8 },
      "rendezvous reassignment on grow lands only on the added shard")
    val movedRate = out.count { case (_, s8, s9) => s8 != s9 }.toDouble / 200
    assert(movedRate < 0.25, s"~1/9 expected, got $movedRate")
  }

  test("zoneMaps: per-bucket min/max/null stats, one row per column") {
    val df = Seq((1L, Some(1.5), 10.0), (1L, None, 20.0), (2L, Some(-3.0), 5.0))
      .toDF("b", "x", "y")
    val out = QualityOps.zoneMaps(df, col("b"), Seq("x", "y"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
    assert(out((1L, "x")) === ((2L, 1L, Some(1500000L), Some(1500000L))))
    assert(out((1L, "y")) === ((2L, 0L, Some(10000000L), Some(20000000L))))
    assert(out((2L, "x")) === ((1L, 0L, Some(-3000000L), Some(-3000000L))))
  }

  test("reciprocalPairs keeps only mutual top-k edges, a < b once") {
    // topk: 1->2 (r1), 2->1 (r2), 1->3 (r2), 3->2 (r1): only (1,2) mutual
    val topk = Seq(
      (1L, 2L, 0.9, 1), (2L, 1L, 0.9, 2), (1L, 3L, 0.5, 2), (3L, 2L, 0.8, 1))
      .toDF("query_id", "nbr_id", "sim", "rank")
    val out = SimilarityOps.reciprocalPairs(topk)
      .as[(Long, Long, Double, Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 2L, 0.9, 1L, 2L)))
  }

  test("invertedIndex: postings capped, df counted before the cap") {
    val docs = Seq((1L, "x y"), (2L, "x"), (3L, "x x z")).toDF("id", "text")
    val out = MapOps.invertedIndex(docs, col("id"), col("text"),
        maxPostings = 2)
      .collect().map(r => (r.getString(0), r.getLong(2)) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    // x: df 3, cap keeps docs 1 and 2; doc 3 (two occurrences) dropped
    assert(out(("x", 1L)) === ((3L, 1L, 0L)))
    assert(out(("x", 2L)) === ((3L, 1L, 0L)))
    assert(!out.contains(("x", 3L)), "cap at 2 drops the third doc")
    assert(out(("y", 1L)) === ((1L, 1L, 1L)))
    assert(out(("z", 3L)) === ((1L, 1L, 2L)))
  }

  test("asOfSnapshot: picks the interval covering ts, open intervals too") {
    val changes = Seq(
      (1L, 100L, 1L, "a"), (1L, 200L, 2L, "b"),
      (2L, 150L, 3L, "x"))
      .toDF("k", "t", "sq", "v")
    val hist = QualityOps.scd2Build(changes, col("k"), col("t"), col("sq"),
      col("v"))
    val snap = QualityOps.asOfSnapshot(hist, lit(120L))
      .select("k", "value").as[(Long, String)].collect().toSet
    assert(snap === Set((1L, "a")), "k=2 starts only at 150")
    val later = QualityOps.asOfSnapshot(hist, lit(500L))
      .select("k", "value").as[(Long, String)].collect().toSet
    assert(later === Set((1L, "b"), (2L, "x")))
  }
}
