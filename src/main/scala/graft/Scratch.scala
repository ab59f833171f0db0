package graft

/** Self-cleaning scratch directories for demo sinks and checkpoints.
  * Everything allocated here is removed by a JVM shutdown hook, so
  * repeated Verify/Bench runs don't accumulate orphaned sink/checkpoint
  * dirs in the system temp dir. Paths stay valid for the life of the
  * process — lazily-read sinks (a parquet dir a returned DataFrame scans
  * later) are safe.
  */
object Scratch {

  /** A fresh temp directory deleted at JVM exit. */
  def dir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    sys.addShutdownHook(deleteRecursively(d.toFile))
    d.toString
  }

  /** A unique lowercase suffix for minting table names. Pure name
    * uniquifier — no filesystem side effects and no shutdown hook,
    * unlike [[dir]] (ADVICE r11: minting a name via `dir` created a
    * throwaway temp directory and registered a hook per call). */
  def nameTag(): String =
    java.util.UUID.randomUUID().toString.replaceAll("-", "")

  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
