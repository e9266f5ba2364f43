package graft.pipelines

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.Canon
import graft.retail.Retail

/** Object-store source/sink exercise (reference: every feed lives in
  * `gs://meta-morph-flow`, transform_utils.py:15–28,
  * ingestion_task.py:222–232) through [[graft.io.ObjectStoreFs]] — a
  * Hadoop FileSystem enforcing object-store semantics (PUT-at-close,
  * copy+delete rename, synthetic prefix directories, no append) over
  * a local zero-egress fixture. The write leg drives Spark's commit
  * protocol across the non-atomic rename (task attempt dirs are
  * COPIED object-by-object, exactly S3A's cost shape); the read leg
  * drives discovery through delimiter prefix listing. Registration is
  * config-only, as a real cloud connector would be.
  */
object ObjectStoreRoundTrip {

  def apply(spark: SparkSession, sfDir: String): DataFrame = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.graftobj.impl", "graft.io.ObjectStoreFs")
    // ABSOLUTE backing root: the hadoop conf ships to executors, and a
    // relative path would resolve against each executor's own work dir
    // — a split-brain store on any multi-process cluster (found by the
    // round-14 netns full-gate run: worker B's task attempts landed in
    // its work dir, the read back saw an empty bucket). The fixture's
    // multi-host contract is a host-shared mount, the local analogue
    // of the object store being one shared service.
    if (hc.get("fs.graftobj.root") == null)
      hc.set("fs.graftobj.root",
        new File("target/objstore").getAbsolutePath)
    val bucket = "meta-morph-rt-" +
      new File(sfDir).getName.replaceAll("[^A-Za-z0-9]", "-")
    val out = s"graftobj://$bucket/suppliers_rt"
    val suppliers = Retail.suppliers(spark, sfDir)
    suppliers.write.mode("overwrite").parquet(out)
    Canon.canonicalize(spark.read.parquet(out))
  }

  /** Same projection as the JDBC roundtrip: the store must hand back
    * exactly what was written. */
  val oracle: String = JdbcRoundTrip.oracle
}
