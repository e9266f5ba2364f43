package graft.io

import java.io.File

/** Cheap content fingerprint of a dataset path (file names, sizes,
  * mtimes) — the staleness key every per-dataset trained artifact folds
  * into its cache identity (IVF centroids, the persisted LSH index, BPE
  * merges): a path alone would serve stale state if the data at that
  * path is regenerated within one JVM or across runs.
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
    else walk(root)
      .map(f => s"${f.getName}:${f.length()}:${f.lastModified()}")
      .mkString("|").hashCode.toHexString
  }
}
