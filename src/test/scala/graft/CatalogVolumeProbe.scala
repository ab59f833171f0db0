package graft

/** Catalog HISTORY-VOLUME pricing (r13 verdict task 6): between
  * retention sweeps the drilled commit rate (60-72 commits/s) accrues
  * one small version file per commit, and every WRITER-side operation
  * (`currentCatalogVersion` → `catalogVersions`) lists the history
  * directory — O(versions) — while pointer READERS (`resolveCatalog`)
  * and pinned point-reads stay O(1). This probe synthesizes 1k / 10k /
  * 100k-version histories (direct version-file writes — publishing
  * 100k real versions would itself be the O(N²) it prices) and
  * measures:
  *   - version-list latency (the cost every CAS basis pays),
  *   - one full commitCatalogCas append on top,
  *   - a pointer resolve and a point version read (reader side),
  *   - the retention sweep reclaiming the whole history (retain=8).
  * Linear-in-N list cost and flat reader cost are the acceptance
  * shape; the probe also crosses the v100000 six-digit boundary so the
  * volume run exercises the `v\d{5,}` fix at real volume.
  *
  * Run: sbt 'Test/runMain graft.CatalogVolumeProbe' → BENCH_SCALE_r14. */
object CatalogVolumeProbe {
  def main(args: Array[String]): Unit = {
    import ops.Incremental
    val spark = Engine.session(appName = "graft-catalog-volume-probe")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    def synth(n: Int): String = {
      val cat = Scratch.dir(s"graft_catvol_$n") + "/store.catalog"
      val hd = java.nio.file.Paths.get(cat + ".history")
      java.nio.file.Files.createDirectories(hd)
      // straddle the six-digit boundary at the largest size so the
      // volume run exercises the v\d{5,} fix where it matters
      val base = if (n >= 100000) 50000 else 0
      (1 to n).foreach { i =>
        val v = base + i
        java.nio.file.Files.write(hd.resolve(f"v$v%05d"),
          Incremental.versionFileBytes(Seq(s"gen$v-meta", "8"))): Unit
      }
      Incremental.publishCatalog(cat, Seq(s"gen${base + n}-meta", "8"))
      cat
    }

    val entries = Seq(1000, 10000, 100000).map { n =>
      val tSynth = time { synth(n) }
      val cat = Scratch.dir(s"graft_catvol_m$n") + "/store.catalog"
      // re-synth into the measured dir (synth above warmed the code path)
      val hd = java.nio.file.Paths.get(cat + ".history")
      java.nio.file.Files.createDirectories(hd)
      val base = if (n >= 100000) 50000 else 0
      (1 to n).foreach { i =>
        val v = base + i
        java.nio.file.Files.write(hd.resolve(f"v$v%05d"),
          Incremental.versionFileBytes(Seq(s"gen$v-meta", "8"))): Unit
      }
      Incremental.publishCatalog(cat, Seq(s"gen${base + n}-meta", "8"))
      val top = base + n

      // writer side: the version list every CAS basis read performs
      val tList = (1 to 5).map(_ =>
        time { Incremental.currentCatalogVersion(cat): Unit }).min
      // one real optimistic commit on top of the full history
      val tCommit = time {
        Incremental.commitCatalogCas(cat)((_, l) => l): Unit
      }
      // reader side: pointer resolve and a pinned-style point read
      val tResolve = (1 to 5).map(_ =>
        time { Incremental.resolveCatalog(cat, expect = 2): Unit }).min
      val tPoint = (1 to 5).map(_ =>
        time { Incremental.resolveCatalogVersion(cat, base + n / 2,
          expect = 2): Unit }).min
      // the retention sweep reclaiming (n + 1 - 8) version files
      val tSweep = time {
        Incremental.gcCatalogHistory(spark, cat, retain = 8): Unit
      }
      require(Incremental.catalogVersions(cat).size == 8,
        "sweep must leave exactly the retained window")
      require(Incremental.currentCatalogVersion(cat) == top + 1,
        "the committed version must be visible across the boundary")
      f""""v$n":{"synth_sec":$tSynth%.3f,"version_list_sec":$tList%.4f,""" +
        f""""cas_commit_sec":$tCommit%.4f,"pointer_resolve_sec":$tResolve%.6f,""" +
        f""""point_read_sec":$tPoint%.6f,"sweep_sec":$tSweep%.2f}"""
    }
    println(s"""{"metric":"catalog_history_volume","versions":[1000,10000,100000],""" +
      entries.mkString(",") + "}")
    spark.stop()
  }
}
