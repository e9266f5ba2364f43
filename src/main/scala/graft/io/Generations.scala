package graft.io

import java.io.File

/** RETIREMENT for SUCCESS-gated feed-generation chains — the lifecycle
  * verb the admission folds (sha/lsh/hll) were missing: build, probe,
  * merge, forget all exist; generations still accumulated one dir per
  * micro-batch forever. GC keeps the newest `keepLast` COMPLETE
  * generations (the fold only ever reads the latest; deeper history
  * exists solely for replay) and deletes everything older, incomplete
  * crash debris included.
  *
  * Contract trade, stated plainly: retention depth bounds REPLAY
  * depth. A foreachBatch replay more than `keepLast` batches behind
  * the head finds its predecessor missing and fails LOUDLY on the
  * family's chain-broken `require` — the standard checkpoint-retention
  * trade (Spark's own commit-log cleanup makes it: such a replay
  * cannot occur under a live checkpoint, which never re-runs batches
  * that far back). Never applicable to the BASE artifact — only
  * `…__feed_<tag>/g<id>` children are candidates.
  */
object Generations {

  private def feedDir(baseDir: String, feedTag: String): File =
    new File(s"${baseDir}__feed_$feedTag")

  /** Feed tags that have generation chains beside this base artifact
    * (feed dirs are SIBLINGS of the base, named
    * `<base>__feed_<tag>`).
    */
  def feeds(baseDir: String): Seq[String] = {
    val base = new File(baseDir)
    val prefix = base.getName + "__feed_"
    Option(Option(base.getParentFile).getOrElse(new File("."))
        .listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith(prefix))
      .map(_.getName.drop(prefix.length)).sorted
  }

  /** [[gc]] across every feed of a base artifact — the scheduled-
    * maintenance form. Returns deleted ids per feed tag.
    */
  def gcAll(baseDir: String, keepLast: Int,
            complete: String => Boolean): Map[String, Seq[Long]] =
    feeds(baseDir).map(tag =>
      tag -> gc(baseDir, tag, keepLast, complete))
      .filter(_._2.nonEmpty).toMap

  /** Generation ids present under the feed dir, sorted ascending;
    * incomplete ones (by the caller's predicate) included — callers
    * see crash debris too.
    */
  def list(baseDir: String, feedTag: String): Seq[Long] = {
    val d = feedDir(baseDir, feedTag)
    Option(d.listFiles()).toSeq.flatten
      .flatMap(f => f.getName match {
        case n if n.startsWith("g") && n.drop(1).forall(_.isDigit) =>
          Some(n.drop(1).toLong)
        case _ => None
      }).sorted
  }

  private def rmTree(f: File): Unit = {
    Option(f.listFiles()).toSeq.flatten.foreach(rmTree)
    f.delete()
  }

  /** Delete generations older than the newest `keepLast` complete
    * ones. Returns the ids deleted. Idempotent; concurrent-fold-safe
    * only in the single-writer sense every feed already assumes
    * (feedTag is 1:1 with one checkpoint).
    */
  def gc(baseDir: String, feedTag: String, keepLast: Int,
         complete: String => Boolean): Seq[Long] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val ids = list(baseDir, feedTag)
    def dirOf(id: Long) = s"${baseDir}__feed_$feedTag/g$id"
    val completeIds = ids.filter(id => complete(dirOf(id)))
    if (completeIds.isEmpty) return Nil
    val cutoff = completeIds.takeRight(keepLast).head
    val doomed = ids.filter(_ < cutoff)
    doomed.foreach(id => rmTree(new File(dirOf(id))))
    doomed
  }
}
