package graft.pipe

import com.fasterxml.jackson.core.json.JsonReadFeature
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** Config model for the external-pipeline operator, mirroring the
  * reference's JSON job config (`/root/reference/properties.json:1-18`,
  * parsed at `Driver.java:66-121`):
  * globals `{stage_dir, mcr_root, mcr_cache_root}` plus named `algorithms`
  * of `{name, binary_dir, executables[{command}], hdfs_in_dir, hdfs_out_dir}`.
  *
  * The shipped reference config has a trailing comma inside `executables`
  * (`properties.json:12`) that its Jettison parser tolerates — we enable
  * Jackson's ALLOW_TRAILING_COMMA so the same file loads here.
  */
/** @param quotedArgs opt-in shell-style quoting for command tokenization
  *                    (config key `quoted_args`): single/double-quoted
  *                    segments keep embedded whitespace. Default false =
  *                    the reference's bare space-split
  *                    (`ExecutorMapper.java:243`), which cannot pass an
  *                    argument containing a space. */
final case class PipelineSpec(
    name: String,
    binaryDir: String,
    commands: Seq[String],
    inDir: String,
    outDir: String,
    quotedArgs: Boolean = false)

final case class PipeGlobals(
    stageDir: String,
    mcrRoot: String,
    mcrCacheRoot: String)

final case class PipeConfig(globals: PipeGlobals, algorithms: Seq[PipelineSpec]) {
  /** Case-insensitive algorithm lookup (`Driver.java:70-76`); abort if
    * absent (`Driver.java:79-85`). */
  def algorithm(name: String): PipelineSpec =
    algorithms.find(_.name.equalsIgnoreCase(name)).getOrElse(
      throw new IllegalArgumentException(
        s"Algorithm '$name' not found in config. Available: ${algorithms.map(_.name).mkString(", ")}"))
}

object PipeConfig {
  private lazy val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.enable(JsonReadFeature.ALLOW_TRAILING_COMMA.mappedFeature())
    m
  }

  def parse(jsonText: String): PipeConfig = {
    val root = mapper.readTree(jsonText)
    def str(n: JsonNode, field: String, default: String = null): String = {
      val v = n.get(field)
      if (v == null || v.isNull) {
        if (default != null) default
        else throw new IllegalArgumentException(s"Missing config field '$field'")
      } else v.asText()
    }
    val globals = PipeGlobals(
      stageDir = str(root, "stage_dir", "/tmp/graft-pipe-stage"),
      mcrRoot = str(root, "mcr_root", ""),
      mcrCacheRoot = str(root, "mcr_cache_root", "/tmp"))
    val algos = Option(root.get("algorithms")).map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
      .map { a =>
        PipelineSpec(
          name = str(a, "name"),
          binaryDir = str(a, "binary_dir", ""),
          commands = Option(a.get("executables")).map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
            .map(e => str(e, "command")),
          inDir = str(a, "hdfs_in_dir", ""),
          outDir = str(a, "hdfs_out_dir", ""),
          quotedArgs = Option(a.get("quoted_args")).exists(_.asBoolean(false)))
      }
    PipeConfig(globals, algos)
  }

  def loadFile(path: String): PipeConfig =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}
