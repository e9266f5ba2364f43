package graft.io

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pure-filesystem contract of the generation retirement helper. */
class GenerationsSpec extends AnyFunSuite {

  private def mkGen(base: String, tag: String, id: Long,
                    complete: Boolean): Unit = {
    val d = new File(s"${base}__feed_$tag/g$id")
    d.mkdirs()
    if (complete) new File(d, "_SUCCESS").createNewFile()
  }

  test("feeds/gc/gcAll: discovery, cutoff, debris, idempotence") {
    val root = Files.createTempDirectory("graft_gens").toFile
    root.deleteOnExit()
    val base = s"$root/idx_base"
    new File(base).mkdirs()
    new File(base, "_SUCCESS").createNewFile()

    mkGen(base, "feedA", 0, complete = true)
    mkGen(base, "feedA", 1, complete = false) // crash debris
    mkGen(base, "feedA", 2, complete = true)
    mkGen(base, "feedA", 3, complete = true)
    mkGen(base, "feedB", 0, complete = true)

    assert(Generations.feeds(base) == Seq("feedA", "feedB"))
    assert(Generations.list(base, "feedA") == Seq(0L, 1L, 2L, 3L))

    // keepLast=2 complete → cutoff at gen 2; gen 0 AND the incomplete
    // gen 1 debris both go
    val deleted = Generations.gc(base, "feedA", keepLast = 2,
      dir => new File(s"$dir/_SUCCESS").exists())
    assert(deleted == Seq(0L, 1L))
    assert(Generations.list(base, "feedA") == Seq(2L, 3L))

    // idempotent; feedB (single gen) untouched at keepLast=1
    val all = Generations.gcAll(base, keepLast = 1,
      dir => new File(s"$dir/_SUCCESS").exists())
    assert(all == Map("feedA" -> Seq(2L)))
    assert(Generations.list(base, "feedA") == Seq(3L))
    assert(Generations.list(base, "feedB") == Seq(0L))
    assert(Generations.gcAll(base, 1,
      dir => new File(s"$dir/_SUCCESS").exists()).isEmpty)

    // the base artifact itself is never a candidate
    assert(new File(base, "_SUCCESS").exists())
  }
}
