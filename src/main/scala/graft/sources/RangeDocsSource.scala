package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full DataSourceV2 BATCH SOURCE — the extensibility surface a
  * framework exposes so users can plug external systems into the scan
  * side of the engine (the Spark-native analog of the reference's
  * pluggable input handling, `Driver.java:50-70`'s input-path wiring).
  * Rows are a deterministic synthetic document census (pure integer
  * formulas), so a DuckDB `generate_series` replays the exact same
  * table and the whole connector stack gets a hash-checked oracle.
  *
  * What makes this the SCALE-correct connector shape (all spec-asserted):
  *
  *  - **Partition planning**: the row range splits into `partitions`
  *    even slices, each an `InputPartition` read independently — a
  *    1000-executor cluster scans this source embarrassingly parallel,
  *    like parquet row-groups.
  *  - **Filter pushdown** (`SupportsPushDownFilters`): `doc_id`
  *    comparisons narrow the generated range BEFORE partition planning —
  *    a `doc_id < N/100` query plans ~1% of the partitions and never
  *    materializes a pruned row (the DSv2 equivalent of parquet
  *    min/max row-group skipping). Pushed filters are FULLY evaluated
  *    by the source (returned as accepted), everything else stays in
  *    Spark's post-scan filter.
  *  - **Column pruning** (`SupportsPushDownRequiredColumns`): the reader
  *    materializes only the pruned schema — a `select(count)` never
  *    builds a string cell.
  *
  * Registered as `graft-range-docs` via `DataSourceRegister`
  * (META-INF/services), the same mechanism the built-in formats use.
  */
class RangeDocsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-range-docs"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeDocsSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RangeDocsTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "8").toInt)
}

object RangeDocsSource {
  /** Deterministic column formulas — mirrored verbatim by the DuckDB
    * oracle: source = 'src' || doc_id % 5; n_chars = 48 + (doc_id *
    * 7919) % 500; quality = (doc_id * 104729) % 1000. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("quality", LongType, nullable = false)))

  def cell(name: String, id: Long): Any = name match {
    case "doc_id" => id
    case "source" => UTF8String.fromString("src" + (id % 5))
    case "n_chars" => 48L + (id * 7919L) % 500L
    case "quality" => (id * 104729L) % 1000L
  }
}

class RangeDocsTable(rows: Long, partitions: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_range_docs($rows)"
  override def schema(): StructType = RangeDocsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeDocsScanBuilder(rows, partitions)
}

class RangeDocsScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  private var lo = 0L
  private var hi = rows
  private var accepted: Array[Filter] = Array.empty
  private var prunedSchema: StructType = RangeDocsSource.schema
  private var pushedAggs: Option[Seq[AggregateFunc]] = None

  /** AGGREGATE pushdown: COUNT(*) / MIN(doc_id) / MAX(doc_id) over the
    * (already filter-narrowed) range have CLOSED FORMS — count is
    * end − start, min is start, max is end − 1 — so an accepted
    * aggregation materializes ZERO rows: each partition emits one
    * partial row computed arithmetically and Spark merges the partials
    * (partial pushdown; `supportCompletePushDown` stays false so the
    * final merge is Spark's). A `count(*)` over a trillion-row range
    * costs the same as over ten rows — the connector analog of parquet
    * footer statistics. */
  override def pushAggregation(agg: Aggregation): Boolean = {
    def isDocId(e: org.apache.spark.sql.connector.expressions.Expression) = e match {
      case nr: NamedReference => nr.fieldNames.toSeq == Seq("doc_id")
      case _ => false
    }
    val ok = agg.groupByExpressions().isEmpty && agg.aggregateExpressions().forall {
      case _: CountStar => true
      case m: Min => isDocId(m.column())
      case m: Max => isDocId(m.column())
      case _ => false
    }
    if (ok) pushedAggs = Some(agg.aggregateExpressions().toSeq)
    ok
  }

  /** Accept doc_id range comparisons by narrowing [lo, hi); everything
    * else is rejected back to Spark. An accepted filter is FULLY
    * enforced here, so it is not returned as a post-scan residual. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition {
      case GreaterThan("doc_id", _: Long) => true
      case GreaterThanOrEqual("doc_id", _: Long) => true
      case LessThan("doc_id", _: Long) => true
      case LessThanOrEqual("doc_id", _: Long) => true
      case EqualTo("doc_id", _: Long) => true
      case _ => false
    }
    ours.foreach {
      case GreaterThan("doc_id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v)
      case LessThan("doc_id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("doc_id", v: Long) => hi = math.min(hi, v + 1)
      case EqualTo("doc_id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _ =>
    }
    accepted = ours
    rest
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    prunedSchema = requiredSchema

  override def build(): Scan = pushedAggs match {
    case Some(aggs) =>
      new RangeDocsAggScan(math.max(lo, 0L), math.max(hi, lo), partitions, aggs)
    case None =>
      new RangeDocsScan(math.max(lo, 0L), math.max(hi, lo), partitions, prunedSchema)
  }
}

/** Pushed-aggregate scan: one arithmetic partial row per partition. */
class RangeDocsAggScan(lo: Long, hi: Long, partitions: Int, aggs: Seq[AggregateFunc])
    extends Scan with Batch {
  override def readSchema(): StructType = StructType(aggs.zipWithIndex.map {
    case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
    case (_, i) => StructField(s"agg_$i", LongType, nullable = true)
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-range-docs AGG-PUSHED [$lo, $hi) ${aggs.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    if (n <= 0) Array(RangeDocsPartition(0, 0))
    else {
      val parts = math.min(partitions.toLong, n).toInt
      (0 until parts).map { i =>
        RangeDocsPartition(lo + i * n / parts, lo + (i + 1) * n / parts)
      }.toArray
    }
  }
  override def createReaderFactory(): PartitionReaderFactory = {
    val kinds: Array[Int] = aggs.map {
      case _: CountStar => 0
      case _: Min => 1
      case _ => 2
    }.toArray
    new RangeDocsAggReaderFactory(kinds)
  }
}

class RangeDocsAggReaderFactory(kinds: Array[Int]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RangeDocsPartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = {
        val empty = p.end <= p.start
        InternalRow.fromSeq(kinds.toSeq.map {
          case 0 => p.end - p.start            // COUNT(*): closed form
          case 1 => if (empty) null else p.start       // MIN(doc_id)
          case _ => if (empty) null else p.end - 1     // MAX(doc_id)
        })
      }
      override def close(): Unit = ()
    }
  }
}

case class RangeDocsPartition(start: Long, end: Long) extends InputPartition

class RangeDocsScan(lo: Long, hi: Long, partitions: Int, prunedSchema: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = prunedSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-range-docs [$lo, $hi) cols=${prunedSchema.fieldNames.mkString(",")}"

  /** Plan over the ALREADY-NARROWED range: a pushed-down point lookup
    * plans one partition, not `partitions`. */
  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    if (n <= 0) Array.empty
    else {
      val parts = math.min(partitions.toLong, n).toInt
      (0 until parts).map { i =>
        RangeDocsPartition(lo + i * n / parts, lo + (i + 1) * n / parts)
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RangeDocsReaderFactory(prunedSchema.fieldNames)
}

class RangeDocsReaderFactory(cols: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RangeDocsPartition]
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      override def next(): Boolean = { id += 1; id < p.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(cols.toSeq.map(c => RangeDocsSource.cell(c, id)))
      override def close(): Unit = ()
    }
  }
}
