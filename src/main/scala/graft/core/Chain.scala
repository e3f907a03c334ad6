package graft.core

import org.apache.spark.sql.DataFrame

/** Operator chaining / multi-job composition (SURVEY §2.11).
  *
  * The reference's ChainMapper/ChainReducer fused a [MAP+ / REDUCE MAP*]
  * pipeline into one task to avoid materialization between operators
  * (reference: hadoop-mapreduce-client-core .../lib/chain/ChainMapper.java:84,
  * engine Chain.java:50); JobControl ran DAGs of dependent jobs
  * (.../lib/jobcontrol/JobControl.java:55). In Spark both are native:
  * chained DataFrame transforms fuse in whole-stage codegen, and the DAG is
  * the lazy plan itself. This helper only gives the pattern a name. */
object Chain {

  /** Chain.of(f, g, h)(df) == df.transform(f).transform(g).transform(h) —
    * fused by Catalyst into as few stages as the shuffles require. */
  def of(stages: (DataFrame => DataFrame)*): DataFrame => DataFrame =
    df => stages.foldLeft(df)((d, f) => d.transform(f))
}
