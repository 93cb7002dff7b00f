package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r20 advisor finding on [[FsUtil.rmTree]]: a directory
  * symlink inside a deleted tree must be removed AS A LINK — recursing
  * through it (what File.listFiles does when handed a link) deletes the
  * TARGET's contents, so a stray link inside a bench temp dir could
  * silently wipe unrelated data. */
class FsUtilSpec extends AnyFunSuite {

  private def tempDir(): Path = Files.createTempDirectory("graft-fsutil")

  test("rmTree deletes a directory symlink without following it") {
    val target = tempDir()
    val keep = target.resolve("keep.txt")
    Files.writeString(keep, "survives")

    val doomed = tempDir()
    Files.writeString(doomed.resolve("own.txt"), "goes")
    val link = doomed.resolve("link-to-target")
    try Files.createSymbolicLink(link, target)
    catch {
      case _: UnsupportedOperationException =>
        cancel("filesystem does not support symlinks")
    }

    FsUtil.rmTree(doomed.toFile)

    assert(!Files.exists(doomed), "the tree itself must be gone")
    assert(Files.exists(target) && Files.exists(keep),
      "the symlink's target must be untouched")
    Files.delete(keep); Files.delete(target)
  }

  test("rmTree still removes real nested trees") {
    val root = tempDir()
    val sub = Files.createDirectories(root.resolve("a/b/c"))
    Files.writeString(sub.resolve("f.txt"), "x")
    FsUtil.rmTree(root.toFile)
    assert(!Files.exists(root))
  }
}
