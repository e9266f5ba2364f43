package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("decodeStub: per-partition batched decode emits typed metadata") {
    val payload1 = "hello world, a binary payload stand-in"
    val payloads = Seq((1L, payload1), (2L, "x")).toDF("doc_id", "text")
      .withColumn("content", col("text").cast("binary"))
    val metas = MultimodalOps.decodeStub(spark, payloads)
      .collect().map(m => m.doc_id -> m).toMap
    assert(metas(1L).n_bytes == payload1.length.toLong)
    assert(metas(1L).width == ('h'.toInt % 64 + 1).toLong)
    assert(metas(1L).height == ('h'.toInt % 48 + 1).toLong)
    assert(metas(1L).n_frames == payload1.length.toLong / 16)
    assert(metas(2L).n_frames == 0L && metas(2L).sampled_frames.isEmpty)
  }

  test("frame sampling picks every Nth frame index") {
    val payloads = Seq((1L, "a" * 400)).toDF("doc_id", "text")
      .withColumn("content", col("text").cast("binary"))
    val m = MultimodalOps.decodeStub(spark, payloads, frameSampleEvery = 7)
      .collect().head
    assert(m.n_frames == 25L)
    assert(m.sampled_frames == Seq(0L, 7L, 14L, 21L))
  }

  test("frameSamples fingerprints the exact byte slice at each offset") {
    val r = MultimodalOps.frameSamples(spark, sfDir)
    val d = graft.io.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    // recompute one sampled frame's md5 from the raw text bytes and match
    val checked = r.join(d, "doc_id")
      .withColumn("expect_md5",
        md5(lower(hex(col("text").cast("binary")
          .substr(col("frame_off").cast("int") + 1,
            lit(MultimodalOps.frameBytes))))))
    assert(checked.filter(col("frame_md5") =!= col("expect_md5")).count() == 0)
    // sampled indices align with the decode seam's arithmetic
    val viaStub = MultimodalOps.decodeStub(spark,
        d.withColumn("content", col("text").cast("binary")))
      .flatMap(m => m.sampled_frames.map(f => (m.doc_id, f)))
      .collect().toSet
    val viaSql = r.select("doc_id", "frame_idx")
      .as[(Long, Long)].collect().toSet
    assert(viaSql == viaStub)
  }

  test("binaryMeta is deterministic and byte-accurate on the fixture") {
    val m = MultimodalOps.binaryMeta(spark, sfDir)
    val d = graft.io.Tables.load(spark, sfDir, "documents")
    assert(m.count() == d.count())
    val bad = m.join(d, "doc_id")
      .filter(col("n_bytes") =!= length(col("text").cast("binary"))).count()
    assert(bad == 0)
  }
}
