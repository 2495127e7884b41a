package graft

import org.scalatest.funsuite.AnyFunSuite
import java.io.RandomAccessFile
import java.nio.file.Files

/** Shuffle-partition derivation (the r8 1000x-soak lesson in code): the
  * initial count must grow with input bytes, floored at the core count.
  */
class SessionSpec extends AnyFunSuite {

  private def withDir(test: java.io.File => Unit): Unit = {
    val dir = Files.createTempDirectory("graft-session-spec").toFile
    try test(dir)
    finally {
      Option(dir.listFiles).foreach(_.foreach { f =>
        Option(f.listFiles).foreach(_.foreach(_.delete())); f.delete()
      })
      dir.delete()
    }
  }

  /** Sparse file: length() reports the logical size without writing it. */
  private def sparse(dir: java.io.File, name: String, bytes: Long): Unit = {
    val raf = new RandomAccessFile(new java.io.File(dir, name), "rw")
    try raf.setLength(bytes) finally raf.close()
  }

  test("small input floors at the core count") {
    withDir { dir =>
      sparse(dir, "t.parquet", 1L << 20) // 1 MB
      assert(GraftSession.derivedShufflePartitions(dir.getPath, 32) === 32)
    }
  }

  test("large input derives ceil(bytes / 32MB) — 4x compression " +
    "headroom over the 128MB target — recursing into subdirs") {
    withDir { dir =>
      val sub = new java.io.File(dir, "lineitem.parquet")
      assert(sub.mkdir())
      sparse(sub, "part-0.parquet", 300L << 20) // 300 MB
      sparse(dir, "orders.parquet", 200L << 20) // 200 MB
      // 500 MB / 32 MB -> ceil = 16, above cores=2 (the r13 100x soak
      // lesson: compressed input bytes understate in-flight working
      // sets, so the derivation biases up and AQE coalesces the excess)
      assert(GraftSession.derivedShufflePartitions(dir.getPath, 2) === 16)
      // but still floored at a larger core count
      assert(GraftSession.derivedShufflePartitions(dir.getPath, 32) === 32)
    }
  }

  test("missing dir degrades to the core floor, not an exception") {
    assert(GraftSession.derivedShufflePartitions("/nonexistent/xyz", 16) === 16)
  }
}
