package graft.operators

import graft.{Q, Tables}
import graft.pipe.{ExternalPipeline, PipeGlobals, PipelineSpec}
import org.apache.spark.sql.functions._

import java.nio.file.attribute.PosixFilePermissions
import java.nio.file.{Files, Path, Paths}

/** SURVEY.md §2 Part A (A1-A5): the reference's scan → external-pipe →
  * collect capability as a declared, oracle-checked query. The stand-in
  * binaries are a 3-stage read→solve→write shell pipeline shaped like the
  * CRANKER config (`/root/reference/properties.json:10-12`): read copies
  * the staged headered input to a shared temp, solve uppercases it into a
  * second temp, write drops the header and emits `result.txt`. The external
  * transform (ASCII uppercase) is chosen so DuckDB's `upper()` can oracle
  * the whole distributed scan→stage→fork→collect path.
  */
object PipeQueries {

  private def ensureDemoBin(): Path = {
    val d = Paths.get(System.getProperty("java.io.tmpdir"), "graft_pipe_demo_bin")
    Files.createDirectories(d)
    def sh(name: String, body: String): Unit = {
      val p = d.resolve(name)
      Files.writeString(p, "#!/bin/sh\n" + body + "\n")
      Files.setPosixFilePermissions(p, PosixFilePermissions.fromString("rwxr-xr-x"))
    }
    sh("run_read.sh", """cp "$2" "$3"""")
    sh("run_solve.sh", """tr a-z A-Z < "$2" > "$3"""")
    sh("run_write.sh", """tail -n +2 "$3" > result.txt""")
    d
  }

  private val a01 = Q(
    "a01_pipe_cranker",
    """SELECT upper(doc_id || chr(9) || text) AS line
       FROM documents ORDER BY line""") { (s, dir) =>
    import s.implicits._
    val bin = ensureDemoBin()
    val spec = PipelineSpec(
      name = "CRANKER",
      binaryDir = bin.toString,
      commands = Seq(
        "run_read.sh %MCR_ROOT% %INPUT_FILE% %TMP_MAT_FILE_1%",
        "run_solve.sh %MCR_ROOT% %TMP_MAT_FILE_1% %TMP_MAT_FILE_2%",
        "run_write.sh %MCR_ROOT% %TMP_MAT_FILE_1% %TMP_MAT_FILE_2%"),
      inDir = "", outDir = "")
    val globals = PipeGlobals(
      stageDir = graft.Scratch.dir("graft_pipe_stage"),
      mcrRoot = "/opt/fake_mcr",
      mcrCacheRoot = "/tmp")
    val lines = Tables.documents(s, dir)
      .select(concat_ws("\t", col("doc_id"), col("text")).as("value")).as[String]
    ExternalPipeline.run(lines, Some("doc_id\ttext"), spec, globals)
      .filter(col("file") === "result.txt")
      .select(col("line"))
      .orderBy("line")
  }

  /** Pipe THROUGHPUT at production payload size (round-7 item 6): a01 is a
    * 0.2s smoke on ~1.5 MB, which prices nothing — this entry pushes the
    * documents table inflated 72× (~111 MB at sf0.1, ~14 MB/partition
    * across 8 partitions) through the same 3-stage stand-in pipeline, so
    * the staged-file write, the three forks, and the result read-back are
    * all exercised at the data volume the reference's CRANKER jobs
    * actually carry. The result is a 1-row integer aggregate (count /
    * bytes / md5-checksum of every piped line), so the oracle verifies
    * the full payload content while the bench time is all pipe, not
    * result materialization.
    *
    * Measured (local[32], best-of-3): 111 MB at sf0.1 runs 0.72s
    * end-to-end vs 0.45s for the same 8-partition pipeline on the 11 MB
    * sf0.001 payload — marginal pipe throughput ≈ 370 MB/s aggregate
    * across the 8 concurrent pipes (~46 MB/s each, `tr`-bound), with a
    * ≈ 0.42s fixed cost per job covering scheduling, partition staging,
    * and 3 forks × 8 partitions (~18 ms per fork+stage). The inflation
    * is map-side (explode AFTER the 8-way repartition of the small
    * table), so only ~1.5 MB shuffles.
    *
    * Scale shape: partitions process independently (A7's narrow, shuffle-
    * free stage); at 100 TB the same plan fans to however many executors
    * hold the scan, each paying the one-time fork cost per partition —
    * which this entry prices. */
  private val a02 = Q(
    "a02_pipe_throughput",
    """SELECT count(*) AS n_lines,
              CAST(sum(length(line)) AS BIGINT) AS n_chars,
              CAST(sum(('0x' || substring(md5(line), 1, 8))::BIGINT) AS BIGINT) AS checksum
       FROM (SELECT upper(doc_id || chr(9) || i || chr(9) || text) AS line
             FROM documents, (SELECT unnest(generate_series(0, 71)) AS i))""") { (s, dir) =>
    import s.implicits._
    val bin = ensureDemoBin()
    val spec = PipelineSpec(
      name = "CRANKER",
      binaryDir = bin.toString,
      commands = Seq(
        "run_read.sh %MCR_ROOT% %INPUT_FILE% %TMP_MAT_FILE_1%",
        "run_solve.sh %MCR_ROOT% %TMP_MAT_FILE_1% %TMP_MAT_FILE_2%",
        "run_write.sh %MCR_ROOT% %TMP_MAT_FILE_1% %TMP_MAT_FILE_2%"),
      inDir = "", outDir = "")
    val globals = PipeGlobals(
      stageDir = graft.Scratch.dir("graft_pipe_stage_tp"),
      mcrRoot = "/opt/fake_mcr",
      mcrCacheRoot = "/tmp")
    val lines = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .repartition(8)
      .select(col("doc_id"), explode(sequence(lit(0), lit(71))).as("i"), col("text"))
      .select(concat_ws("\t", col("doc_id"), col("i"), col("text")).as("value"))
      .as[String]
    ExternalPipeline.run(lines, Some("doc_id\ti\ttext"), spec, globals)
      .filter(col("file") === "result.txt")
      .agg(count(lit(1)).as("n_lines"),
        sum(length(col("line"))).cast("long").as("n_chars"),
        sum(conv(substring(md5(col("line")), 1, 8), 16, 10).cast("long")).as("checksum"))
  }

  val defs: Seq[Q] = Seq(a01, a02)
}
