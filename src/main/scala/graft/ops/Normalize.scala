package graft.ops

import org.apache.spark.sql.DataFrame

/** Column-name conformance ops (reference ingestion_task.py:8–12 and the
  * bulk withColumnRenamed chains at :29–33, 93–101, 164–169, 235–244).
  * Pure metadata operations — they only rewrite the plan's projection, so
  * they are free at any scale.
  */
object Normalize {

  /** Trim + uppercase + spaces→underscores over every column name
    * (reference P1, ingestion_task.py:8–12).
    */
  def normalizeColumnNames(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(c => c.trim.toUpperCase.replace(' ', '_')).toIndexedSeq: _*)

  /** Bulk rename (reference P2). Unknown keys are ignored, matching
    * `withColumnRenamed` semantics.
    */
  def renameAll(df: DataFrame, mapping: Map[String, String]): DataFrame =
    df.withColumnsRenamed(mapping)

  /** Fixed projection / reorder by name (reference P3). */
  def selectCols(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(df.col).toIndexedSeq: _*)
}
