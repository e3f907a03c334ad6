package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embarrassingly-parallel exhaustive search — the reference's
  * DistributedPentomino / DistBbp demo shape (reference:
  * MR-EX/dancing/DistributedPentomino.java:51 splits the dancing-links
  * search by a width-`depth` prefix of placements, one mapper per prefix;
  * MR-EX/pi/DistBbp.java works the same way over digit ranges).
  *
  * The Spark-first rendering: enumerate the prefix set with
  * `spark.range`, run the backtracking kernel per seed inside
  * `mapPartitions` (pure CPU, zero I/O), and reduce with an ordinary
  * aggregation. The search space partitions perfectly — at any cluster
  * size the only communication is the final counts shuffle, so the shape
  * scales to arbitrarily deep searches by widening the prefix. */
object SearchOps {

  /** n-queens solution counts grouped by the first queen's column: the
    * search splits on the (col0, col1) prefix — n² seeds, invalid prefixes
    * pruned in the kernel — and each seed's subtree is counted by a
    * bitmask backtracker. Output (c0, n_solutions) is tiny, deterministic,
    * and fully recomputable by a relational oracle. */
  def nQueensByFirstColumn(spark: SparkSession, n: Int): DataFrame = {
    require(n >= 4 && n <= 16, s"n must be in [4,16]: $n")
    import spark.implicits._
    val full = (1 << n) - 1
    spark.range(n.toLong * n)
      // n² seeds arrive as one narrow range; spread the CPU-bound kernel
      // over every core (same rationale as Graft.rebalanceForCompute)
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions { it =>
        def solve(row: Int, cols: Int, d1: Int, d2: Int): Long =
          if (row == n) 1L
          else {
            var cnt = 0L
            var avail = ~(cols | d1 | d2) & full
            while (avail != 0) {
              val bit = avail & -avail
              avail -= bit
              cnt += solve(row + 1, cols | bit, (d1 | bit) << 1, (d2 | bit) >> 1)
            }
            cnt
          }
        it.flatMap { seed =>
          val c0 = (seed / n).toInt
          val c1 = (seed % n).toInt
          val b0 = 1 << c0
          val b1 = 1 << c1
          // masks as seen by row 1 after placing (0, c0)
          val cols1 = b0; val d11 = b0 << 1; val d21 = b0 >> 1
          if ((b1 & (cols1 | d11 | d21)) != 0) None
          else Some((c0.toLong,
            solve(2, cols1 | b1, ((d11 | b1) << 1) & full, (d21 | b1) >> 1)))
        }
      }
      .toDF("c0", "cnt")
      .groupBy("c0")
      .agg(sum("cnt").cast("long").as("n_solutions"))
  }
}
