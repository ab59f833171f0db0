package graft

/** Child-JVM worker for the cross-JVM CAS race drill (CasCrossJvmSpec /
  * CasCrossJvmProbe): runs `n` optimistic-commit updates against a
  * shared catalog, racing OTHER JVMs doing the same — the deployment
  * shape the d69 commit protocol claims to support (independent ingest
  * / compaction / re-train jobs sharing one catalog on a shared
  * filesystem). No SparkSession: the catalog machinery is pure
  * java.nio, so the child proves the cross-PROCESS claim without the
  * cost of a second Spark runtime.
  *
  * args: catalogPath workerId nUpdates committerName(hardlink|createnew)
  * Prints one `CASRACE_OK <id> <v1,v2,...>` line with the committed
  * version numbers; any exception exits non-zero (the parent asserts). */
object CasRaceMain {
  def main(args: Array[String]): Unit = {
    val Array(cat, id, n, committerName) = args
    val committer: ops.Incremental.SlotCommitter =
      if (committerName == ops.Incremental.CreateNewCommitter.name)
        ops.Incremental.CreateNewCommitter
      else ops.Incremental.HardLinkCommitter
    val committed = (0 until n.toInt).map { i =>
      val (v, _) = ops.Incremental.commitCatalogCas(
        cat, maxAttempts = 10000, committer) { (_, cur) => cur :+ s"$id-$i" }
      v
    }
    println(s"CASRACE_OK $id ${committed.mkString(",")}")
  }
}
