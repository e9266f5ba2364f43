package graft.io

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink (reference S4/S5, transform_utils.py:95–129: every
  * reference pipeline starts and ends in Postgres).
  *
  * Scale posture vs the reference:
  *  - reference reads a whole table through ONE connection/partition
  *    (no partitionColumn — transform_utils.py:123–127); `read` here takes
  *    optional (partitionColumn, lowerBound, upperBound, numPartitions) so
  *    executors scan ranges in parallel.
  *  - writes batch through `batchsize` rather than row-at-a-time.
  *
  * The harness has no Postgres; tests and the q_ingest_customers query run
  * against embedded Derby (a real JDBC engine on the Spark classpath), and
  * the URL/driver are parameters so a Postgres profile is config-only.
  */
object Jdbc {

  def derbyUrl(dbDir: String): String = s"jdbc:derby:$dbDir;create=true"

  private def props(extra: Map[String, String]): Properties = {
    val p = new Properties()
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  def read(spark: SparkSession, url: String, table: String,
           partitionColumn: Option[String] = None,
           bounds: Option[(Long, Long)] = None,
           numPartitions: Int = 8,
           options: Map[String, String] = Map.empty): DataFrame =
    (partitionColumn, bounds) match {
      case (Some(colName), Some((lo, hi))) =>
        spark.read.jdbc(url, table, colName, lo, hi, numPartitions,
          props(options))
      case _ =>
        spark.read.jdbc(url, table, props(options))
    }

  def write(df: DataFrame, url: String, table: String, mode: SaveMode,
            batchSize: Int = 10000,
            options: Map[String, String] = Map.empty): Unit =
    df.write.mode(mode)
      .options(options + ("batchsize" -> batchSize.toString))
      .jdbc(url, table, props(Map.empty))

  /** IDEMPOTENT batch append: delete-then-append keyed on a batch id
    * column. foreachBatch replays a micro-batch whenever the sink write
    * finished but the checkpoint commit did not (its contract is
    * at-least-once); because the streaming checkpoint makes batch ids
    * stable across restarts, deleting the batch's prior rows first makes
    * the replay converge to exactly-once — the standard pattern for
    * sinks without transactional MERGE coupling to the checkpoint.
    *
    * The delete touches only `WHERE batchCol = batchId` (an indexed/
    * partitioned predicate in a real warehouse — bounded by one batch,
    * never a table scan of history). A missing table (first batch) just
    * appends.
    */
  def writeBatchIdempotent(df: DataFrame, url: String, table: String,
                           batchCol: String, batchId: Long,
                           batchSize: Int = 10000,
                           options: Map[String, String] = Map.empty): Unit = {
    // same credentials/properties as the Spark write below — a probe
    // authenticated differently from the writer could disagree with it
    val conn = java.sql.DriverManager.getConnection(url, props(options))
    try {
      // Existence probe by zero-row query, not getMetaData.getTables:
      // the metadata API needs the STORED identifier case (upper on
      // Derby, lower on Postgres — a wrong guess silently skips the
      // delete and breaks exactly-once) and treats '_' in the name as a
      // pattern wildcard. The probe query folds identifier case exactly
      // like the DELETE itself, so the two can never disagree.
      //
      // ONLY table-not-found states count as "first batch": a transient
      // connection drop, auth failure, or lock timeout here must abort
      // the batch (foreachBatch retries it), NOT silently skip the
      // DELETE — that would duplicate the replay and break the
      // exactly-once contract this method exists to provide.
      val exists =
        try {
          val st = conn.prepareStatement(s"SELECT 1 FROM $table WHERE 1=0")
          try { st.executeQuery().close(); true } finally st.close()
        } catch {
          case e: java.sql.SQLException if isTableMissing(e) => false
        }
      if (exists) {
        // Spark's JDBC writer creates columns as QUOTED identifiers, so
        // the predicate must quote too (unquoted would fold case —
        // BATCH_ID vs "batch_id" under Derby/Postgres rules); the table
        // name stays exactly as the caller hands it to Spark
        val st = conn.prepareStatement(
          s"""DELETE FROM $table WHERE "$batchCol" = ?""")
        try { st.setLong(1, batchId); st.executeUpdate() }
        finally st.close()
      }
    } finally conn.close()
    write(df, url, table, SaveMode.Append, batchSize, options)
  }

  /** Table-not-found SQLSTATEs across the engines this sink targets:
    * Derby 42X05 ("table/view does not exist"), Postgres 42P01
    * ("undefined_table"), and class 42S02 (SQL-standard "base table or
    * view not found" — MySQL/MariaDB/SQLServer). Anything else — 08xxx
    * connection errors, 28xxx auth, 40001/40XL1 lock timeouts — is NOT
    * "missing" and must propagate.
    */
  private def isTableMissing(e: java.sql.SQLException): Boolean =
    Option(e.getSQLState).exists(s =>
      s == "42X05" || s == "42P01" || s == "42S02")
}
