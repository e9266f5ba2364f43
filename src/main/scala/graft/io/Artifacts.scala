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
}
