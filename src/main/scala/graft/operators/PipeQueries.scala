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

  val defs: Seq[Q] = Seq(a01)
}
