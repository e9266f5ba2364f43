package graft.io

import java.io.{File, FileNotFoundException, IOException, RandomAccessFile}
import java.nio.file.{Files, StandardCopyOption}
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{CreateFlag, FSDataInputStream,
  FSDataOutputStream, FSInputStream, FileStatus, FileSystem, Path,
  PathFilter}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** PROTOCOL-FAITHFUL OBJECT-STORE FILESYSTEM (`graftobj://bucket/key`)
  * — the missing-connector seam closed with a local, zero-egress
  * fixture that enforces OBJECT-STORE SEMANTICS rather than POSIX
  * ones. The reference reads its feeds straight from a cloud bucket
  * (`gs://meta-morph-flow`, transform_utils.py:15–28,
  * ingestion_task.py:222–232); the real S3A/GCS connector jars are
  * unvendorable in this offline build (verified absent from every
  * cache), so this FileSystem implements the SEMANTIC CONTRACT those
  * connectors impose — the part that breaks POSIX-minded pipelines —
  * behind the standard Hadoop `FileSystem` SPI that Spark's readers,
  * writers and committers already speak:
  *
  *  - **objects, not files**: a write is buffered and becomes visible
  *    ATOMICALLY AT close() (PUT semantics); a crashed writer leaves
  *    NO partial object, only multipart litter under `.multipart/`;
  *  - **no append**: [[append]] throws, as S3/GCS do;
  *  - **non-atomic rename**: rename is COPY + DELETE, per object —
  *    byte-for-byte what S3A does, with the same consequences for
  *    commit protocols (FileOutputCommitter v1 still works, paying a
  *    copy; the drill in ObjectStoreFsSpec pins the cost is copy-
  *    shaped, not move-shaped);
  *  - **synthetic directories**: a "directory" EXISTS iff some object
  *    lies under its prefix or a `_DIRMARKER` object marks it
  *    ([[mkdirs]] writes one, the S3A empty-dir marker pattern);
  *    deleting the last object makes the whole prefix vanish;
  *  - **flat listing**: [[listStatus]] is a delimiter prefix scan.
  *
  * Registration is config-only, exactly like a cloud connector:
  * `spark.hadoop.fs.graftobj.impl = graft.io.ObjectStoreFs`; the
  * backing root comes from `fs.graftobj.root` (default
  * `target/objstore`), one subdirectory per bucket. Executors resolve
  * the class from the application jar like any packaged source.
  */
class ObjectStoreFs extends FileSystem {

  private var fsUri: java.net.URI = _
  private var bucketDir: File = _
  private var workDir: Path = _

  private val Marker = "_DIRMARKER"
  private val MultipartDir = ".multipart"
  private val BlockSize = 32L * 1024 * 1024

  override def getScheme: String = "graftobj"

  override def initialize(uri: java.net.URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    setConf(conf)
    fsUri = java.net.URI.create(
      s"${uri.getScheme}://${Option(uri.getAuthority).getOrElse("default")}")
    // a RELATIVE root is anchored at the repo (env) when available:
    // executors resolve relative paths against their own work dirs,
    // which splits the store across processes — the conf writer
    // (ObjectStoreRoundTrip) ships an absolute path, this is the
    // defense for conf carrying the bare default
    val rootRaw = conf.get("fs.graftobj.root", "target/objstore")
    val root =
      if (new File(rootRaw).isAbsolute) rootRaw
      else sys.env.get("SPARK_GRAFT_REPO")
        .map(r => s"$r/$rootRaw").getOrElse(rootRaw)
    bucketDir = new File(root, Option(uri.getAuthority).getOrElse("default"))
    bucketDir.mkdirs()
    new File(bucketDir, MultipartDir).mkdirs()
    workDir = new Path(fsUri.toString + "/")
  }

  override def getUri: java.net.URI = fsUri
  override def getWorkingDirectory: Path = workDir
  override def setWorkingDirectory(dir: Path): Unit = { workDir = dir }

  /** Bucket-relative key of a path ("" = bucket root). */
  private def keyOf(p: Path): String = {
    val abs = if (p.isAbsolute) p else new Path(workDir, p)
    abs.toUri.getPath.stripPrefix("/")
  }

  private def backing(p: Path): File =
    if (keyOf(p).isEmpty) bucketDir else new File(bucketDir, keyOf(p))

  /** An object = a real backing file that is not bookkeeping. */
  private def isObject(f: File): Boolean = f.isFile

  /** A synthetic directory exists iff ANY object (marker included)
    * lies under the prefix — empty backing dirs are NOT directories.
    */
  private def prefixInhabited(f: File): Boolean =
    f.isDirectory && (f.getName == MultipartDir match {
      case true => false
      case false =>
        val kids = Option(f.listFiles()).getOrElse(Array.empty)
        kids.exists(k => isObject(k) ||
          (k.isDirectory && k.getName != MultipartDir && prefixInhabited(k)))
    })

  private def status(p: Path, f: File): FileStatus =
    if (f.isFile)
      new FileStatus(f.length(), false, 1, BlockSize, f.lastModified(),
        makeQualified(p))
    else
      new FileStatus(0, true, 1, BlockSize, 0L, makeQualified(p))

  override def getFileStatus(p: Path): FileStatus = {
    val f = backing(p)
    if (f == bucketDir) return status(p, f) // the bucket always exists
    if (isObject(f)) status(p, f)
    else if (prefixInhabited(f)) status(p, f)
    else throw new FileNotFoundException(s"graftobj: no object at $p")
  }

  override def listStatus(p: Path): Array[FileStatus] = {
    val f = backing(p)
    if (isObject(f)) return Array(status(p, f))
    if (f != bucketDir && !prefixInhabited(f))
      throw new FileNotFoundException(s"graftobj: no prefix at $p")
    Option(f.listFiles()).getOrElse(Array.empty)
      .filter(k => k.getName != MultipartDir && k.getName != Marker)
      .filter(k => isObject(k) || prefixInhabited(k))
      .sortBy(_.getName)
      .map(k => status(new Path(makeQualified(p), k.getName), k))
  }

  override def open(p: Path, bufferSize: Int): FSDataInputStream = {
    val f = backing(p)
    if (!isObject(f)) throw new FileNotFoundException(s"graftobj: $p")
    new FSDataInputStream(new ObjectInput(f))
  }

  /** PUT semantics: bytes buffer in `.multipart/`; the object appears
    * atomically at close(). */
  override def create(p: Path, permission: FsPermission,
                      overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val dst = backing(p)
    if (isObject(dst) && !overwrite)
      throw new IOException(s"graftobj: object exists: $p")
    if (prefixInhabited(dst))
      throw new IOException(s"graftobj: $p is a prefix with objects")
    val tmp = new File(new File(bucketDir, MultipartDir),
      UUID.randomUUID().toString)
    val out = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(tmp), math.max(bufferSize, 4096))
    new FSDataOutputStream(new java.io.FilterOutputStream(out) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        out.write(b, off, len)
      override def close(): Unit = {
        out.close()
        dst.getParentFile.mkdirs() // backing tree only; dirs stay synthetic
        Files.move(tmp.toPath, dst.toPath,
          StandardCopyOption.REPLACE_EXISTING)
      }
    }, statistics)
  }

  override def append(p: Path, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException(
      "graftobj: object stores do not append")

  /** COPY + DELETE, per object — the S3A rename. Hadoop contract:
    * renaming onto an existing directory moves the source INTO it. */
  override def rename(src: Path, dst: Path): Boolean = {
    val sf = backing(src)
    if (!isObject(sf) && !prefixInhabited(sf)) return false
    val target =
      if (prefixInhabited(backing(dst)) || backing(dst) == bucketDir)
        new Path(dst, src.getName)
      else dst
    val tf = backing(target)
    if (isObject(tf) || prefixInhabited(tf)) return false
    copyTree(sf, tf)
    deleteTree(sf)
    true
  }

  private def copyTree(s: File, d: File): Unit =
    if (s.isFile) {
      d.getParentFile.mkdirs()
      Files.copy(s.toPath, d.toPath, StandardCopyOption.REPLACE_EXISTING)
    } else Option(s.listFiles()).getOrElse(Array.empty)
      .filter(_.getName != MultipartDir)
      .foreach(k => copyTree(k, new File(d, k.getName)))

  private def deleteTree(f: File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
    f.delete()
    // empty backing parents are invisible anyway; prune for hygiene
    var p = f.getParentFile
    while (p != null && p != bucketDir &&
      Option(p.listFiles()).exists(_.isEmpty)) { p.delete(); p = p.getParentFile }
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    val f = backing(p)
    if (isObject(f)) { deleteTree(f); true }
    else if (prefixInhabited(f)) {
      val contents = listStatus(p)
      if (!recursive && contents.nonEmpty)
        throw new IOException(s"graftobj: non-empty prefix $p")
      deleteTree(f); true
    } else false
  }

  /** The S3A empty-dir marker pattern: an empty `_DIRMARKER` object
    * makes the prefix listable before any data lands. */
  override def mkdirs(p: Path, permission: FsPermission): Boolean = {
    val f = backing(p)
    if (isObject(f)) throw new IOException(s"graftobj: $p is an object")
    if (f != bucketDir && !prefixInhabited(f)) {
      val m = new File(f, Marker)
      m.getParentFile.mkdirs()
      m.createNewFile()
    }
    true
  }

  private class ObjectInput(f: File) extends FSInputStream {
    private val raf = new RandomAccessFile(f, "r")
    override def seek(pos: Long): Unit = raf.seek(pos)
    override def getPos: Long = raf.getFilePointer
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(): Int = raf.read()
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      raf.read(b, off, len)
    override def read(pos: Long, b: Array[Byte], off: Int,
                      len: Int): Int = {
      val mark = raf.getFilePointer
      try { raf.seek(pos); raf.read(b, off, len) }
      finally raf.seek(mark)
    }
    override def available(): Int =
      math.min(raf.length() - raf.getFilePointer, Int.MaxValue).toInt
    override def close(): Unit = raf.close()
  }
}
