package graft.pipelines

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The drift → index-freshness rule (the lshRecallGate drill pattern):
  * a drifted feed must REFUSE the stale trained indexes, loudly,
  * before anything probes them.
  */
class DriftGateSpec extends SparkSpec {
  import spark.implicits._

  test("drift index gate: fixture day pair passes; a mega-source crawl " +
      "drifts past the threshold and the gate refuses the stale index") {
    // the fixture's synthetic yesterday→today delta is sampling noise —
    // it may trip the 1% dashboard flag but must clear the 5% action
    // gate, or every healthy day would force a retrain
    val healthy = MicroQueries.driftIndexGate(spark, sfDir)
    assert(healthy <= MicroQueries.driftGateTvMax,
      s"healthy fixture drift $healthy above the gate's own threshold")
    assert(healthy > 0.0, "zero drift — the synthetic day pair is vacuous")

    // failure drill: today's crawl suddenly one mega-source (the
    // crawler-regression shape) — source-mix TV explodes and the gate
    // ABORTS with the refresh directive, exactly what the incremental
    // chain's fail-fast loop turns into a stopped run
    val prev = graft.io.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "lang", "source", "n_chars")
    val skewed = prev.withColumn("source", lit("megacrawl"))
    val ex = intercept[IllegalStateException] {
      MicroQueries.driftIndexGateFrom(
        MicroQueries.corpusDriftFrames(prev, skewed),
        MicroQueries.driftGateTvMax)
    }
    assert(ex.getMessage.contains("drift-index-gate"))
    assert(ex.getMessage.contains("stale"))
    assert(ex.getMessage.contains("feature=source"))
  }

  test("incremental chain order: the drift gate sits between the drift " +
      "report and every task that probes a trained artifact") {
    val names = graft.Runner.incrementalChain(spark, sfDir).map(_._1)
    val gate = names.indexOf("drift_index_gate")
    assert(gate >= 0, s"gate missing from chain $names")
    assert(names.indexOf("corpus_drift") < gate,
      "gate must follow the drift report it acts on")
    // the funnel probes the persisted LSH index and scores against the
    // LM tables — it must be DOWNSTREAM of the gate so a drifted feed
    // never reaches a stale index (fail-fast ordering)
    assert(gate < names.indexOf("ingest_funnel"),
      s"funnel not gated: $names")
    assert(gate < names.indexOf("incremental_score"))
  }

  test("tokenizer drift gate: fixture feed passes; a shifted-script " +
      "feed refuses the stale tokenizer; chain order holds") {
    // healthy: the incremental batch is same-distribution text — the
    // gate returns its share without throwing
    val batch = graft.ext.DedupOps.incrementalBatchDocs(spark, sfDir)
    val healthy =
      graft.ext.UnigramOps.tokenizerDriftGate(spark, sfDir, batch)
    assert(healthy >= 0.0 && healthy <= 1.0)

    // drill: the feed arrives in a shifted script (reversed tokens —
    // same alphabet, missed piece inventory) — the gate ABORTS with
    // the retrain directive before anything encodes with the artifact
    val drifted = batch.select(col("doc_id"),
      concat_ws(" ", transform(split(col("text"), " "),
        t => reverse(t))).as("text"))
    val ex = intercept[IllegalStateException] {
      graft.ext.UnigramOps.tokenizerDriftGate(spark, sfDir, drifted)
    }
    assert(ex.getMessage.contains("tokenizer-drift-gate"))
    assert(ex.getMessage.contains("stale"))

    // chain order: the tokenizer gate sits with the index gate, before
    // every task that encodes or scores under trained artifacts
    val names = graft.Runner.incrementalChain(spark, sfDir).map(_._1)
    val tok = names.indexOf("tokenizer_drift_gate")
    assert(tok >= 0, s"tokenizer gate missing from chain $names")
    assert(names.indexOf("drift_index_gate") < tok)
    assert(tok < names.indexOf("incremental_score"), s"chain $names")
    assert(tok < names.indexOf("ingest_funnel"), s"chain $names")
  }

  test("a drifted feed stops the chain loop before the funnel runs") {
    // drive the chain's own fail-fast loop shape with the gate task
    // replaced by the drilled (drifted) gate: tasks after it never run
    val prev = graft.io.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "lang", "source", "n_chars")
    val skewed = prev.withColumn("source", lit("megacrawl"))
    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    val tasks: Seq[(String, () => Long)] = Seq(
      "corpus_drift" -> (() => { ran += "corpus_drift"; 3L }),
      "drift_index_gate" -> (() => {
        ran += "drift_index_gate"
        MicroQueries.driftIndexGateFrom(
          MicroQueries.corpusDriftFrames(prev, skewed),
          MicroQueries.driftGateTvMax)
        1L
      }),
      "ingest_funnel" -> (() => { ran += "ingest_funnel"; 1L }))
    intercept[IllegalStateException] {
      tasks.foreach { case (_, run) => run(); () }
    }
    assert(ran.toSeq == Seq("corpus_drift", "drift_index_gate"),
      s"tasks after the failing gate ran: $ran")
  }
}
