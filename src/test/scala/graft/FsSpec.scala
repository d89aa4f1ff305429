package graft

import org.scalatest.funsuite.AnyFunSuite

/** `Fs.dirSignature` — the cache-key twin of `dirVersion`. Every
  * driver cache keyed on an index sub-directory's state must observe
  * ANY rebuild, including ones `dirVersion` (max mtime) cannot see:
  * same-second delete-and-rebuild, a file replaced by an older one,
  * content swapped between files.
  */
class FsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def touch(dir: java.nio.file.Path, name: String,
      bytes: Int, mtime: Long): java.nio.file.Path = {
    val p = dir.resolve(name)
    java.nio.file.Files.write(p, Array.fill[Byte](bytes)(7))
    java.nio.file.Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(mtime))
    p
  }

  test("signature sees changes max-mtime misses") {
    val d = java.nio.file.Paths.get(TestSpark.tmpDir("fssig"))
    java.nio.file.Files.createDirectories(d)
    val t = 1700000000000L
    touch(d, "a", 10, t)
    touch(d, "b", 20, t + 5000)
    def sig() = graft.core.Fs.dirSignature(spark, d.toString)
    def ver() = graft.core.Fs.dirVersion(spark, d.toString)
    val s0 = sig()
    assert(sig() == s0, "signature must be deterministic")

    // a file REGRESSES in mtime (rebuilt from an older artifact): max
    // mtime is unchanged — the signature must still move
    java.nio.file.Files.setLastModifiedTime(d.resolve("a"),
      java.nio.file.attribute.FileTime.fromMillis(t - 5000))
    assert(ver() == t + 5000)
    val s1 = sig()
    assert(s1 != s0, "mtime regression invisible to signature")

    // mtimes SWAPPED between two files (same multiset of stats): the
    // per-file (path, len, mtime) mixing must distinguish them
    touch(d, "a", 10, t + 5000)
    touch(d, "b", 20, t - 5000)
    assert(sig() != s1 && sig() != s0, "mtime swap invisible to signature")

    // same mtimes, a file's LENGTH changes (same-second rewrite)
    touch(d, "a", 11, t + 5000)
    val s2 = sig()
    assert(s2 != s1, "length change invisible to signature")

    // add / remove a file at an old mtime (max mtime unchanged)
    touch(d, "c", 5, t - 10000)
    val s3 = sig()
    assert(s3 != s2, "added file invisible to signature")
    java.nio.file.Files.delete(d.resolve("c"))
    assert(sig() == s2, "signature must depend only on surviving files")
  }
}
