package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Output-boundary canonicalization.
  *
  * Every `SparkEntry.queries` result is compared by the driver against a
  * DuckDB oracle at the *representation* level (the driver hashes values as
  * read back from parquet / fetchdf). Internally queries use exact DECIMAL
  * arithmetic and native DATE/TIMESTAMP — the right types for
  * order-independent aggregation at 100 TB — but the comparison boundary
  * must be representation-stable across engines, so the final projection of
  * every query is narrowed to {BIGINT, DOUBLE, VARCHAR, BOOLEAN}:
  *
  *  - DECIMAL / FLOAT  → DOUBLE  (IEEE nearest of the same exact decimal is
  *                                bit-identical in both engines)
  *  - BYTE/SHORT/INT   → BIGINT
  *  - DATE             → VARCHAR 'yyyy-MM-dd'
  *  - TIMESTAMP        → VARCHAR 'yyyy-MM-dd HH:mm:ss'
  *
  * Each oracle SQL mirrors the same casts in its final SELECT
  * (CAST(x AS DOUBLE) / CAST(x AS BIGINT) / strftime(...)).
  */
object Canon {

  /** Cache-scope discipline for queries that persist big intermediates:
    * materialize the (small) result into the cache, then release the
    * intermediates. Callers get a cached result frame and leak no
    * intermediate blocks into the session — previously only Verify/Bench's
    * blanket clearCache hid the leak from other library users. The result
    * frame itself stays cached (it IS the returned value; tiny at every
    * call site) — callers may unpersist it when done.
    */
  def materialized(result: DataFrame,
                   intermediates: DataFrame*): DataFrame = {
    val out = result.persist()
    out.count()
    intermediates.foreach(_.unpersist(false))
    out
  }

  def canonicalize(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.toIndexedSeq.map { f =>
      f.dataType match {
        case _: DecimalType | FloatType =>
          col(f.name).cast(DoubleType).as(f.name)
        case ByteType | ShortType | IntegerType =>
          col(f.name).cast(LongType).as(f.name)
        case DateType =>
          date_format(col(f.name), "yyyy-MM-dd").as(f.name)
        case _: TimestampType =>
          date_format(col(f.name), "yyyy-MM-dd HH:mm:ss").as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols: _*)
  }
}
