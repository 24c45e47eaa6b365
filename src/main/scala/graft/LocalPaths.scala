package graft

/** Local-filesystem helpers shared by the bench/probe mains, the gate's
  * work-dir factory, and specs — ONE recursive delete instead of the seven
  * copies the r13 review counted. */
object LocalPaths {

  /** Best-effort recursive delete of a local directory tree (no symlink
    * traversal concerns on the bench/test paths this serves). */
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  def deleteRecursively(path: String): Unit =
    deleteRecursively(new java.io.File(path))
}
