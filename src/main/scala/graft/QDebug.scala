package graft
import org.apache.spark.sql.SparkSession

object QDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.DedupOps
    for (b <- Seq(DedupOps.numBands, 1)) {
      val r = DedupOps.lshRecallGate(spark, sfDir, floor = 0.0, bandsUsed = b)
      println(s"bands=$b -> gate recall=$r")
    }
    spark.stop()
  }
}
