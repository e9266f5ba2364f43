package graft.io

/** OUT-OF-PROCESS PostgreSQL fixture (tools/pg_fixture.sh) — closes the
  * one gap embedded Derby leaves in the JDBC gate: Derby is single-JVM
  * by design, so on a real spark:// cluster executor processes cannot
  * open the driver's in-process database and the roundtrip query is
  * untestable. This fixture is a genuine separate-process database
  * reached over TCP, so the SAME `io.Jdbc` read/write paths (reference
  * transform_utils.py:95–129 — every reference pipeline starts and ends
  * in Postgres) are exercised across process and host boundaries:
  * local[n] threads, spark:// executor JVMs, and workers isolated in
  * another network namespace all connect as remote clients.
  *
  * Only the driver ever calls [[ensure]] (query functions run
  * driver-side; executors merely open JDBC connections), so the shell
  * fixture needs to exist only where Verify/Bench/Runner run.
  */
object PgFixture {

  val port: Int =
    sys.env.get("SPARK_GRAFT_PGPORT").map(_.toInt).getOrElse(54329)

  /** Host executors use to reach the fixture. 127.0.0.1 is correct for
    * local[n] and same-host spark:// workers; a netns/second-host
    * cluster overrides with the address routable from the workers.
    */
  def host: String = sys.env.getOrElse("SPARK_GRAFT_PG_HOST", "127.0.0.1")

  def url: String = s"jdbc:postgresql://$host:$port/graft?user=graft"

  @volatile private var ensured = false

  /** Idempotently start (or confirm) the fixture server; returns the
    * JDBC url. Fails loudly — a silently-skipped fixture would turn
    * the connector gate into a no-op.
    */
  /** Locate tools/pg_fixture.sh independent of the JVM working
    * directory: SPARK_GRAFT_REPO env (set by the netns cluster's
    * spark-submit wrapper) wins, then an upward walk from the cwd for
    * a directory containing tools/pg_fixture.sh (the repo-root marker).
    */
  private[io] def fixtureScript: java.io.File = {
    val fromEnv = sys.env.get("SPARK_GRAFT_REPO")
      .map(r => new java.io.File(r, "tools/pg_fixture.sh"))
    def walkUp: Option[java.io.File] =
      Iterator.iterate(new java.io.File(".").getAbsoluteFile.getCanonicalFile)(_.getParentFile)
        .takeWhile(_ != null).take(8)
        .map(d => new java.io.File(d, "tools/pg_fixture.sh"))
        .find(_.exists)
    fromEnv.orElse(walkUp).getOrElse(new java.io.File("tools/pg_fixture.sh"))
  }

  def ensure(): String = synchronized {
    if (!ensured) {
      val script = fixtureScript
      require(script.exists,
        s"pg fixture script missing: ${script.getAbsolutePath} " +
          "(set SPARK_GRAFT_REPO to the repo root when launching from elsewhere)")
      val p = new ProcessBuilder("bash", script.getAbsolutePath)
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes())
      require(p.waitFor() == 0, s"pg fixture failed:\n$out")
      ensured = true
    }
    url
  }
}
