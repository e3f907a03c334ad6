package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Join semantics modeled on the reference's TestJoinDatamerge fixtures:
  * N sorted (key, value) sources with controlled overlap. */
class JoinOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def src(rows: (Int, Int)*) = rows.toDF("key", "value")

  test("inner join emits only keys present in ALL sources") {
    val out = JoinOps.innerJoin(
      Seq(src(1 -> 10, 2 -> 20), src(2 -> 200, 3 -> 300)), "key")
    assert(out.select("key").as[Int].collect().toSeq == Seq(2))
  }

  test("outer join emits keys present in ANY source, absent slots null") {
    val out = JoinOps.outerJoin(
      Seq(src(1 -> 10).withColumnRenamed("value", "v1"),
        src(2 -> 200).withColumnRenamed("value", "v2")), "key")
    val rows = out.orderBy("key").collect()
    assert(rows.length == 2)
    assert(rows(0).getInt(0) == 1 && rows(0).isNullAt(2))
    assert(rows(1).getInt(0) == 2 && rows(1).isNullAt(1))
  }

  test("override join keeps value from the RIGHTMOST source that has the key") {
    val out = JoinOps.overrideJoin(
      Seq(src(1 -> 1, 2 -> 1, 3 -> 1), src(2 -> 2, 4 -> 2), src(2 -> 3)),
      "key", "value")
    val m = out.as[(Int, Int)].collect().toMap
    assert(m == Map(1 -> 1, 2 -> 3, 3 -> 1, 4 -> 2))
  }

  test("inner join with duplicate keys yields the cross-product of matches") {
    val out = JoinOps.innerJoin(Seq(src(1 -> 10, 1 -> 11), src(1 -> 20, 1 -> 21)), "key")
    assert(out.count() == 4)
  }

  test("tagged join caps each side's per-key group before the cross product") {
    val left = Seq((1, "l1"), (1, "l2"), (1, "l3")).toDF("key", "lv")
    val right = Seq((1, "r1"), (1, "r2"), (1, "r3")).toDF("key", "rv")
    val out = JoinOps.taggedJoin(left, right, "key",
      Seq(col("lv")), Seq(col("rv")), maxPerGroup = 2)
    // 2 x 2, not 3 x 3 — and deterministically the first two of each order
    val got = out.select("lv", "rv").as[(String, String)].collect().toSet
    assert(got == Set(("l1", "r1"), ("l1", "r2"), ("l2", "r1"), ("l2", "r2")))
  }

  test("as-of join picks the latest right row at or before each left time") {
    val quotes = Seq( // (key, qt, px)
      (1, 10L, 1.0), (1, 20L, 2.0), (1, 20L, 2.5), (2, 5L, 9.0)
    ).toDF("key", "qt", "px")
    val trades = Seq( // (key, tt, trade)
      (1, 5L, "t0"),  // before any quote -> null
      (1, 15L, "t1"), // -> px 1.0
      (1, 20L, "t2"), // equal time counts; tie on qt=20 -> last by px => 2.5
      (1, 99L, "t3"), // -> 2.5
      (3, 9L, "t4")   // no quotes for key -> null
    ).toDF("key", "tt", "trade")
    val out = JoinOps.asOfJoin(trades, quotes, "key", "tt", "qt",
      rightOrder = Seq("px"))
    val m = out.select("trade", "px").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(m == Map("t0" -> None, "t1" -> Some(1.0), "t2" -> Some(2.5),
      "t3" -> Some(2.5), "t4" -> None))
  }

  test("semi/anti join") {
    val a = src(1 -> 1, 2 -> 2, 3 -> 3)
    val b = src(2 -> 0)
    assert(JoinOps.semiJoin(a, b, "key").select("key").as[Int].collect().toSeq == Seq(2))
    assert(JoinOps.antiJoin(a, b, "key").select("key").as[Int]
      .collect().toSeq.sorted == Seq(1, 3))
  }

  test("joinDelta: old view plus delta equals the full re-join") {
    val aOld = Seq((1, "a1"), (2, "a2")).toDF("key", "av")
    val aDel = Seq((2, "a2d"), (3, "a3")).toDF("key", "av")
    val bOld = Seq((1, "b1"), (3, "b3")).toDF("key", "bv")
    val bDel = Seq((2, "b2"), (3, "b3d")).toDF("key", "bv")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("key", "av", "bv").as[(Int, String, String)]
        .collect().toSeq.sorted
    val delta = JoinOps.joinDelta(aOld, aDel, bOld, bDel, Seq("key"))
    val oldView = aOld.join(bOld, Seq("key"))
    val full = aOld.unionByName(aDel).join(bOld.unionByName(bDel),
      Seq("key"))
    assert(rows(oldView.unionByName(delta)) === rows(full),
      "IVM invariant: M ∪ ΔM = full re-join, as multisets")
    assert(rows(delta).nonEmpty)
  }

  test("joinDeltaSigned: signed delta cancels retractions against the view") {
    // A loses (2,"a2") and gains (3,"a3"); B loses (3,"b3") and gains
    // (2,"b2") — exercises deletes on BOTH sides plus every cross-term
    // sign combination (+·+, +·−, −·+, −·−)
    val aOld = Seq((1, "a1"), (2, "a2")).toDF("key", "av")
    val aDelta = Seq((3, "a3", 1), (2, "a2", -1)).toDF("key", "av", "sign")
    val bOld = Seq((1, "b1"), (2, "b2x"), (3, "b3")).toDF("key", "bv")
    val bDelta = Seq((2, "b2", 1), (3, "b3", -1)).toDF("key", "bv", "sign")
    val delta = JoinOps.joinDeltaSigned(aOld, aDelta, bOld, bDelta,
      Seq("key"))
    // consolidate: old view as +1 rows, then net out signs per row
    val oldSigned = aOld.join(bOld, Seq("key")).withColumn("sign", lit(1))
    val consolidated = oldSigned.unionByName(delta)
      .groupBy("key", "av", "bv").agg(sum(col("sign")).as("n"))
      .filter(col("n") =!= 0)
    val aNew = Seq((1, "a1"), (3, "a3")).toDF("key", "av")
    val bNew = Seq((1, "b1"), (2, "b2x"), (2, "b2")).toDF("key", "bv")
    val full = aNew.join(bNew, Seq("key"))
      .groupBy("key", "av", "bv").agg(count(lit(1)).as("n"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("key", "av", "bv", "n").as[(Int, String, String, Long)]
        .collect().toSeq.sorted
    assert(rows(consolidated) === rows(full),
      "consolidated signed view must equal the re-joined new bases")
    // a retraction actually flowed through: some delta row is negative
    assert(delta.filter(col("sign") < 0).count() > 0)
  }
}
