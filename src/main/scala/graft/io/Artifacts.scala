package graft.io

/** Base directory for persisted per-dataset artifacts (the LSH index,
  * bucketed fact layouts, ingest staging). Defaults to `target/` — the
  * harness contract — and is overridable for deployment, where index
  * artifacts live on shared storage (HDFS/object-store paths work
  * unchanged: everything under them goes through Spark readers/writers
  * or the Hadoop FS API):
  *
  *  - `GRAFT_ARTIFACT_ROOT` env var — the deployment knob;
  *  - `graft.artifact.root` JVM system property — takes precedence, and
  *    is what tests use (env vars cannot be set in-JVM).
  *
  * Read per call (a `def`), so a test override applies without JVM
  * restart; production processes set it once at launch.
  */
object Artifacts {
  def root: String =
    sys.props.get("graft.artifact.root")
      .orElse(sys.env.get("GRAFT_ARTIFACT_ROOT"))
      .getOrElse("target")

  /** Shared-artifact tier switch (default ON): telemetry and lifecycle
    * queries read the persisted, fingerprint-stamped derived tables
    * (LSH verified pairs, the BM25 tf postings) instead of re-deriving
    * them from the corpus per query — the build-once/probe-many
    * contract of a deployed index. The DESIGNATED BUILDER queries
    * (q_minhash_lsh, q_bm25) always run the full build path, so the
    * bench keeps measuring true build cost; Bench reports this flag in
    * its JSON line. Disable with `graft.shared.artifacts=0` (sysprop)
    * or `SPARK_GRAFT_SHARED_ARTIFACTS=0` (env) to force every query to
    * rebuild its chain standalone.
    */
  def sharedTier: Boolean =
    sys.props.get("graft.shared.artifacts")
      .orElse(sys.env.get("SPARK_GRAFT_SHARED_ARTIFACTS"))
      .forall(v => v != "0" && !v.equalsIgnoreCase("false"))
}
