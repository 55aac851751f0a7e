package graft.engine

/** Minimal filesystem helpers shared by the driver-contract mains. */
object Fs {

  /** Recursive delete that survives the two classic traps: `listFiles`
    * returns null on I/O error (not just for non-directories), and a
    * half-deleted tree must not abort the caller's loop — failures are
    * the caller's policy (wrap or let propagate).
    */
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }
}
