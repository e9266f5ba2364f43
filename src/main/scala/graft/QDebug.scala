package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc scratch main for plan/timing investigation (contents change
  * per investigation; not part of any chain or gate).
  */
object QDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $tag sec=${(System.nanoTime() - t0) / 1e9}%.2f"); r
    }
    import graft.ext.{CurationOps, TextOps}
    val dt = TextOps.documents(spark, sfDir)
      .repartition(col("doc_id"))
      .select(col("doc_id"), filter(split(TextOps.normText(col("text")), " "), t => t =!= "").as("toks"))
      .filter(size(col("toks")) > 0)
    time("tokenize+count")(dt.count())
    val dg = dt.select(col("doc_id"),
      explode(concat(col("toks"),
        transform(sequence(lit(2), size(col("toks"))),
          i => concat_ws(" ", slice(col("toks"), i - 1, lit(2)))))).as("g"))
    time("grams")(dg.count())
    val withMd5 = dg.select(col("doc_id"), md5(col("g")).as("h"))
    time("md5-only")(withMd5.count())
    def d(i: Int) =
      s"(instr('0123456789abcdef', substr(md5(g), $i, 1)) - 1)"
    val bsql = s"((${d(1)} * 4096 + ${d(2)} * 256 + ${d(3)} * 16 + ${d(4)}) % 64)"
    val db = dg.select(col("doc_id"), expr(bsql).cast("long").as("b"))
    time("md5x4-bucket")(db.count())
    val hist = db.groupBy("doc_id", "b").agg(count(lit(1)).as("n"))
    time("hist")(hist.count())
    spark.stop()
  }
}
