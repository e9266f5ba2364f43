package graft.io

import java.io.File

/** Cheap content fingerprint of a dataset path (file names, sizes,
  * mtimes) — the staleness key every per-dataset trained artifact folds
  * into its cache identity (IVF centroids, the persisted LSH index, BPE
  * merges): a path alone would serve stale state if the data at that
  * path is regenerated within one JVM or across runs.
  *
  * The key is a 128-bit MD5 digest of the full listing (names, sizes,
  * mtimes) prefixed with the file count and total bytes — not a 32-bit
  * `String.hashCode`, whose birthday bound (~77k keys for a 50% clash)
  * is reachable across many datasets × retrains, and whose collision
  * would silently serve a stale trained artifact as fresh. MD5 is used
  * as a fast change detector, not for security.
  *
  * Granularity caveat: mtimes are millisecond-resolution, so a
  * regeneration completing within the same millisecond with identical
  * file names AND sizes is indistinguishable. Real rewrites change
  * sizes or part-file names (Spark writers stamp task UUIDs), so this
  * is theoretical; callers that rewrite in place at sub-ms cadence
  * should version the path instead.
  */
object Fingerprint {

  def ofPath(path: String): String = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory)
        // listFiles is null if the dir vanished mid-walk (concurrent
        // regeneration — the very scenario fingerprints guard); treat
        // as empty rather than NPE, the fingerprint just comes out
        // different, which is the safe direction
        Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
          .sortBy(_.getName).flatMap(walk)
      else Seq(f)
    val root = new File(path)
    if (!root.exists()) "absent"
    else {
      val files = walk(root)
      val listing = files
        .map(f => s"${f.getName}:${f.length()}:${f.lastModified()}")
        .mkString("|")
      val stamped =
        s"n=${files.size};bytes=${files.map(_.length()).sum};$listing"
      java.security.MessageDigest.getInstance("MD5")
        .digest(stamped.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
  }
}
