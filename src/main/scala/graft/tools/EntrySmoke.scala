package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-contract smoke: SparkEntry.entry must return >0 rows on sf0.001.
  * runMain graft.tools.EntrySmoke */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.session("smoke")
    val rows = graft.SparkEntry.entry(spark).count()
    println(s"ENTRY_ROWS=$rows")
    require(rows > 0, "entry() returned no rows")
    spark.stop()
  }
}
