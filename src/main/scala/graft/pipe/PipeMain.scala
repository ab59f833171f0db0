package graft.pipe

import org.apache.spark.sql.SparkSession

/** `Driver.main`-parity CLI — the reference's only user entry point
  * (`/root/reference/src/main/java/com/optforms/mrexecutor/driver/Driver.java:33-85`),
  * so a user of the reference can run this engine the same way:
  *
  * {{{ graft.pipe.PipeMain <algorithm> <properties_json_path> [data_header] }}}
  *
  * Reference behavior mirrored:
  *  - fewer than 2 args → usage on stderr, exit 2 (`Driver.java:41-45`);
  *  - algorithm resolved case-insensitively from the JSON config
  *    (`Driver.java:70-76`), FATAL + exit 1 when absent (`Driver.java:79-85`);
  *  - the data header comes from argv[2], else it is prompted from stdin
  *    (`Driver.java:91-103`) — the header is always prepended (`Driver.java:109-110`);
  *  - the job reads `hdfs_in_dir`, pipes every partition through the
  *    algorithm's executables, and lands the `*.txt` result lines under
  *    `hdfs_out_dir` (`Driver.java:133-141`), one subdirectory per output
  *    file name. The write goes through Spark's commit protocol, so unlike
  *    the reference's in-task HDFS copy it is safe under task retries; like
  *    the reference's `FileOutputFormat`, an existing output dir aborts.
  */
object PipeMain {

  def main(args: Array[String]): Unit =
    sys.exit(run(args, graft.Engine.session(appName = "graft-pipe")))

  /** Testable body: returns the process exit code instead of exiting.
    * `spark` is by-name so arg validation never builds a session; `stdin`
    * is injectable for the no-header prompt path. */
  def run(args: Array[String], spark: => SparkSession,
      stdin: () => String = () => scala.io.StdIn.readLine()): Int = {
    if (args.length < 2) {
      System.err.println("Usage: graft-pipe <algorithm> <properties_json_path> [data_header]")
      return 2
    }
    val config = PipeConfig.loadFile(args(1))
    val spec =
      try config.algorithm(args(0))
      catch {
        case _: IllegalArgumentException =>
          println(s"FATAL: Configuration for algorithm '${args(0)}', could not be " +
            s"found in configuration file, '${args(1)}'. Aborting.")
          return 1
      }
    val header = if (args.length >= 3) args(2) else {
      println(s"\nPlease enter header for data files in '${spec.inDir}' directory: ")
      stdin()
    }
    try {
      ExternalPipeline.runJob(spark, config, spec.name, Option(header))
        .write.partitionBy("file").text(spec.outDir)
      0
    } catch {
      case e: Exception =>
        System.err.println(s"Job failed: ${e.getMessage}")
        1
    }
  }
}
