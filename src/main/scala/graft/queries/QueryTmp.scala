package graft.queries

import java.nio.{file => nio}

/** Temp dirs created by sink-through queries (q70 merge log, q71 indexed
  * merge) are registered here and removed recursively by one JVM shutdown
  * hook — a query invocation must not leak populated temp dirs.
  */
object QueryTmp {
  private val registered =
    java.util.Collections.synchronizedList(new java.util.ArrayList[nio.Path]())
  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach(p => delete(p.toFile))
    }))
  }

  def deleteRecursivelyOnExit(p: nio.Path): Unit = {
    hook
    registered.add(p)
    ()
  }

  private def delete(f: java.io.File): Unit = {
    val cs = f.listFiles()
    if (cs != null) cs.foreach(delete)
    f.delete()
    ()
  }
}
