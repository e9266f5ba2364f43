package graft.pipelines

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ext.TextOps
import graft.io.{Sinks, Sources}
import graft.ops.Canon

/** JSONL sink + schema-declared source round trip over the documents
  * corpus — the interchange format LLM corpora actually ship in (one
  * JSON object per line). The read-back declares the schema (no
  * inference pass — the Sources discipline) and runs FAILFAST: a
  * corrupt line in an ingest feed stops the run loudly rather than
  * silently nulling rows. The PERMISSIVE quarantine and DROPMALFORMED
  * policies are exercised by JsonlSpec on deliberately corrupted files.
  *
  * Hash-exactness of the round trip is the point of the gate: JSON
  * string escaping, Unicode, and 64-bit integers must survive
  * write → parse byte-identically for the DuckDB twin (which reads the
  * ORIGINAL parquet) to hash-match.
  */
object JsonlRoundTrip {

  def apply(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = TextOps.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    // under the artifact root (not a CWD-relative path) so concurrent
    // sessions with distinct roots cannot overwrite each other's
    // round-trip dir mid-read, and running from another working
    // directory doesn't scatter output
    val dir = s"${graft.io.Artifacts.root}/jsonl/" +
      s"${new File(sfDir).getName}/documents"
    Sinks.jsonl(docs, dir)
    Canon.canonicalize(
      Sources.jsonl(spark, dir, docs.schema, mode = "FAILFAST"))
  }

  val oracle: String =
    """SELECT doc_id, text, lang, source, n_chars FROM documents""".stripMargin
}
