package graft.pipelines

import java.io.File

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.io.Jdbc
import graft.ops.Canon
import graft.retail.Retail

/** JDBC sink + partitioned JDBC source exercise (reference S4/S5,
  * transform_utils.py:95–129). The reference reads every Postgres table
  * through a single connection; here the read-back declares
  * (partitionColumn, bounds, numPartitions) so executors fetch key ranges
  * in parallel — the pattern that matters when the table is large.
  * Embedded Derby stands in for Postgres (same code path, config-only swap).
  */
object JdbcRoundTrip {

  def apply(spark: SparkSession, sfDir: String): DataFrame = {
    val url = Jdbc.derbyUrl(
      s"target/derby/${new File(sfDir).getName}/suppliers_db")
    val suppliers = Retail.suppliers(spark, sfDir)
    Jdbc.write(suppliers, url, "suppliers_rt", SaveMode.Overwrite)
    val hi = suppliers.count() // key range for the partitioned read
    val back = Jdbc.read(spark, url, "suppliers_rt",
      partitionColumn = Some("SUPPLIER_ID"), bounds = Some((1L, hi.max(2L))),
      numPartitions = 8)
    Canon.canonicalize(back)
  }

  /** The same roundtrip through the OUT-OF-PROCESS PostgreSQL fixture
    * ([[graft.io.PgFixture]]) — the reference's actual warehouse
    * engine, reached over TCP by every executor process. Embedded
    * Derby (above) keeps the zero-dependency in-JVM gate; this query
    * is the one that stays green on a real multi-process cluster,
    * where Derby's single-JVM design cannot. Table name carries the
    * SF so concurrent gates at different scales never collide.
    */
  def pg(spark: SparkSession, sfDir: String): DataFrame = {
    val url = graft.io.PgFixture.ensure()
    val table = "suppliers_rt_" +
      new File(sfDir).getName.replaceAll("[^A-Za-z0-9]", "_")
    // explicit driver class: under spark-submit the vendored jar rides
    // in --jars (session classloader), where DriverManager's service
    // discovery cannot see it — Spark's DriverRegistry can
    val opts = Map("driver" -> "org.postgresql.Driver")
    val suppliers = Retail.suppliers(spark, sfDir)
    Jdbc.write(suppliers, url, table, SaveMode.Overwrite, options = opts)
    val hi = suppliers.count() // key range for the partitioned read
    val back = Jdbc.read(spark, url, table,
      partitionColumn = Some("SUPPLIER_ID"), bounds = Some((1L, hi.max(2L))),
      numPartitions = 8, options = opts)
    Canon.canonicalize(back)
  }

  val oracle: String =
    s"""WITH ${Retail.sql.suppliers}
       |SELECT SUPPLIER_ID, SUPPLIER_NAME, CONTACT_DETAILS, REGION
       |FROM suppliers""".stripMargin
}
