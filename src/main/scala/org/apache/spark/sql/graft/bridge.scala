package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge. Spark 4 routes Column through
  * ColumnNode and keeps the conversion `private[sql]`; this shim lives
  * under the sql package namespace solely to re-export it to graft.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Actually free the blocks behind a `localCheckpoint()`-ed frame.
    * `Dataset.unpersist()` only consults the CacheManager, and a local
    * checkpoint persists its RDD directly without registering there —
    * so the public API call is a silent no-op and the blocks would
    * otherwise live until driver GC. Returns false when the plan is
    * not a materialized LogicalRDD. */
  def freeLocalCheckpoint(df: org.apache.spark.sql.DataFrame): Boolean = {
    val rdds = df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }
    rdds.foreach { r =>
      r.unpersist(blocking = false)
      // a RELIABLY checkpointed frame (spark.graft.fence=reliable)
      // holds its data as files, not blocks — unpersist alone would
      // leak one checkpoint dir per superseded frame until the
      // checkpoint FS fills (ContextCleaner only reclaims these with
      // cleanCheckpoints=true AND driver GC); delete the files of the
      // superseded frame explicitly. Caller contract unchanged: the
      // frame is superseded and never read again.
      r.getCheckpointFile.foreach { dir =>
        val path = new org.apache.hadoop.fs.Path(dir)
        path.getFileSystem(
          df.sparkSession.sparkContext.hadoopConfiguration)
          .delete(path, true): Unit
      }
    }
    rdds.nonEmpty
  }
}
