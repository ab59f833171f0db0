package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A full DataSourceV2 BATCH SINK with a real TWO-PHASE COMMIT — the
  * write-side counterpart of [[RangeDocsSource]], and the Spark-native
  * answer to the reference's unsafe in-task output copy
  * (`ExecutorMapper.java:221-226`, where a re-executed task double-writes
  * into the shared output dir; its A8 "cleanup" step exists to mop that
  * up). Here the task attempt NEVER publishes: each `DataWriter` streams
  * rows to a uniquely-named staging file, `commit()` hands the filename
  * back as a `WriterCommitMessage`, and only the DRIVER's job-level
  * `commit(messages)` writes the `_graft_manifest` that makes files
  * visible. A failed/retried attempt's file is deleted by `abort()` and
  * — even if the JVM dies before that — is never listed, so readers
  * (which trust only the manifest) cannot observe it. Exactly the
  * parquet `_spark_metadata` / commit-coordinator design, reproduced at
  * connector scale and spec-verified under an injected task retry.
  *
  * Rows serialize as TSV (longs + strings only — enforced at build), one
  * staging file per task attempt, embarrassingly parallel, no renames of
  * shared paths — an object-store-safe layout (S3 has no atomic rename;
  * manifest-commit is the standard workaround).
  */
class ManifestSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-manifest-sink"
  // write-only source: schema comes from the query being written
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ManifestTable(properties.get("path"), schema,
      new CaseInsensitiveStringMap(properties)
        .getLong("residueTtlMs", ManifestSink.DefaultResidueTtlMs))
}

object ManifestSink {
  val ManifestName = "_graft_manifest"

  /** Age after which an orphaned `stage-*` file is treated as CRASH
    * residue and swept by the next successful commit. Job-scoped GC alone
    * cannot reclaim files from a hard-crashed job (abort never ran, the
    * files are in no manifest, and the jobId prefix is foreign), so
    * residue would otherwise accumulate in the sink directory forever.
    * The TTL must exceed the longest expected concurrent write to the
    * same path — a LIVE writer's in-flight staging files must never be
    * swept; override per-write with the `residueTtlMs` option. */
  val DefaultResidueTtlMs: Long = 24L * 60 * 60 * 1000

  /** Read back ONLY committed content: the manifest is the source of
    * truth; stray staging files (crashed attempts) are invisible. */
  def committedFiles(path: String): Seq[String] = {
    val mf = Paths.get(path, ManifestName)
    if (!Files.exists(mf)) Seq.empty
    else Files.readAllLines(mf, StandardCharsets.UTF_8).asScala.toSeq
      .filter(_.nonEmpty).map(f => new File(path, f).toString)
  }
}

class ManifestTable(path: String, schema: StructType,
    residueTtlMs: Long = ManifestSink.DefaultResidueTtlMs)
  extends Table with SupportsWrite {
  require(path != null && path.nonEmpty, "graft-manifest-sink requires a path option")
  override def name(): String = s"graft_manifest_sink($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val s = info.schema()
    require(s.fields.forall(f => f.dataType == LongType || f.dataType == StringType),
      s"graft-manifest-sink serializes TSV: long/string columns only, got $s")
    new WriteBuilder with SupportsTruncate {
      // overwrite mode: truncating just forgets the old manifest — old
      // staging files become invisible garbage, collected by commit()
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new ManifestBatchWrite(path, s, residueTtlMs)
      }
    }
  }
}

class ManifestBatchWrite(path: String, schema: StructType,
    residueTtlMs: Long = ManifestSink.DefaultResidueTtlMs) extends BatchWrite {
  // Staging files are scoped to THIS job: a concurrent writer to the same
  // path must not have its in-flight stage files garbage-collected by our
  // commit (which would fail its commit, or worse let it publish a
  // manifest naming deleted files). The job id is minted once, driver
  // side, and rides into every task's staging filename.
  private val jobId = UUID.randomUUID().toString.substring(0, 8)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    ManifestWriterFactory(path, jobId, schema.fields.map(_.dataType == LongType))

  /** DRIVER-side publish: the only step that makes data visible. Runs
    * once, after every task committed; atomic via temp-file + move. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect { case StagedFile(name) => name }.sorted
    // the manifest being replaced: its files become invisible the moment
    // the new manifest lands, so they are safe to collect too
    val prev = Option(Paths.get(path, ManifestSink.ManifestName))
      .filter(Files.exists(_))
      .map(Files.readAllLines(_, StandardCharsets.UTF_8).asScala.toSet)
      .getOrElse(Set.empty[String])
    val tmp = Paths.get(path, s".${ManifestSink.ManifestName}.tmp")
    Files.write(tmp, files.mkString("\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, Paths.get(path, ManifestSink.ManifestName),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // collect only OUR aborted-attempt files plus the replaced manifest's
    // now-invisible files — another job's in-flight staging is untouched —
    // plus CRASH residue: foreign stage-* files older than the TTL belong
    // to a job whose abort() never ran (they are in no manifest and no
    // live writer holds them, provided the TTL exceeds the longest
    // concurrent write — see DefaultResidueTtlMs)
    val cutoff = System.currentTimeMillis() - residueTtlMs
    Option(new File(path).listFiles()).getOrElse(Array.empty)
      .filter { f =>
        val n = f.getName
        !files.contains(n) && n.startsWith("stage-") &&
          (n.startsWith(s"stage-$jobId-") || prev.contains(n) ||
            f.lastModified() < cutoff)
      }
      .foreach(_.delete())
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case StagedFile(name) => name }
      .foreach(n => new File(path, n).delete())
}

case class StagedFile(name: String) extends WriterCommitMessage

case class ManifestWriterFactory(path: String, jobId: String, isLong: Array[Boolean])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    new File(path).mkdirs()
    val name = s"stage-$jobId-$partitionId-$taskId-${UUID.randomUUID()}.tsv"
    new DataWriter[InternalRow] {
      private val out = Files.newBufferedWriter(Paths.get(path, name),
        StandardCharsets.UTF_8)
      override def write(row: InternalRow): Unit = {
        val cells = isLong.indices.map { i =>
          if (isLong(i)) row.getLong(i).toString else row.getUTF8String(i).toString
        }
        out.write(cells.mkString("\t")); out.write("\n")
      }
      override def commit(): WriterCommitMessage = { out.close(); StagedFile(name) }
      override def abort(): Unit = { out.close(); new File(path, name).delete() }
      override def close(): Unit = ()
    }
  }
}
