package graft

import java.nio.{file => nio}

/** All test temp dirs/files live under one per-JVM root that a shutdown hook
  * removes recursively — suites used to leak hundreds of /tmp/graft_* dirs
  * per run. Call sites keep their descriptive prefixes for debuggability
  * while the run is live.
  */
object TestTmp {
  private lazy val root: nio.Path = {
    val r = nio.Files.createTempDirectory("graft_tests")
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(r.toFile)))
    r
  }

  private def delete(f: java.io.File): Unit = {
    val cs = f.listFiles()
    if (cs != null) cs.foreach(delete)
    f.delete()
    ()
  }

  def dir(prefix: String): nio.Path =
    nio.Files.createTempDirectory(root, prefix)

  def file(prefix: String, suffix: String): nio.Path =
    nio.Files.createTempFile(root, prefix, suffix)
}
