package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.{DedupOps, TextOps}

class SignatureMinSpec extends SparkSpec {
  import spark.implicits._

  test("sig_min over split shingle sets equals the whole-set signature") {
    // MinHash merge algebra on real fixture text: signature(A ∪ B) ==
    // min(signature(A), signature(B)), for A/B = the two halves of each
    // document's hashed-shingle array
    val d = TextOps.documents(spark, sfDir)
      .withColumn("norm", TextOps.normText(col("text")))
      .select(col("doc_id"),
        DedupOps.hashedShinglesOfNorm(col("norm")).as("sh"))
      .filter(size(col("sh")) >= 2)
    val whole = d
      .select(col("doc_id"), MinHashSignature(col("sh")).as("sig"))
    val parts = d.select(col("doc_id"), explode(array(
        slice(col("sh"), lit(1), size(col("sh")) / 2),
        expr("slice(sh, size(sh) div 2 + 1, size(sh))"))).as("part"))
      .select(col("doc_id"),
        MinHashSignature(col("part")).as("psig"))
    val merged = parts.groupBy("doc_id")
      .agg(SignatureMin.column(col("psig")).as("sig"))
    val joined = whole.as[(Long, Seq[Long])].collect().toMap
    val got = merged.as[(Long, Seq[Long])].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, sig) =>
      assert(sig == joined(id), s"doc $id merge != whole-set signature")
    }
  }

  test("empty-part groups merge to the empty-set sentinel; SQL-callable") {
    SignatureMin.register(spark)
    val sentinel = Seq.fill(SignatureMin.width)(MinHashSignature.P)
    // a group whose only parts are empty shingle sets must aggregate to
    // exactly MinHashSignature's empty sentinel (the neutral element)
    val sigs = TextOps.documents(spark, sfDir)
      .withColumn("norm", TextOps.normText(col("text")))
      .select(col("lang"),
        MinHashSignature(DedupOps.hashedShinglesOfNorm(col("norm")))
          .as("sig"))
    sigs.createOrReplaceTempView("sig_min_probe")
    val empty = spark.sql(
      "SELECT sig_min(sig) AS m FROM sig_min_probe WHERE lang = 'no-such'")
      .as[Seq[Long]].collect()
    assert(empty.isEmpty || empty.head == sentinel)
    // grouped SQL use: one merged corpus signature per lang, every slot
    // a real (sub-sentinel) minimum
    val rows = spark.sql(
      "SELECT lang, sig_min(sig) AS corpus_sig FROM sig_min_probe GROUP BY lang")
      .as[(String, Seq[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, sig) =>
      assert(sig.length == SignatureMin.width)
      assert(sig.forall(_ < MinHashSignature.P)) // every lang has shingles
    }
    // null rows are IGNORED like builtin aggregates, never an NPE
    val withNulls = spark.sql(
      """SELECT lang, sig FROM sig_min_probe
        |UNION ALL SELECT lang, CAST(NULL AS ARRAY<BIGINT>) FROM sig_min_probe
        |""".stripMargin)
    withNulls.createOrReplaceTempView("sig_min_nulls_probe")
    val withNullRows = spark.sql(
      "SELECT lang, sig_min(sig) FROM sig_min_nulls_probe GROUP BY lang")
      .as[(String, Seq[Long])].collect().sortBy(_._1)
    assert(withNullRows.toSeq == rows.sortBy(_._1).toSeq)
  }
}
