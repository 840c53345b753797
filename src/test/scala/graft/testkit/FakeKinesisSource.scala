package graft.testkit

import java.time.Instant
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Test-scoped DataSourceV2 stub registered as format "aws-kinesis"
  * (via the test classpath's META-INF/services entry), serving canned
  * in-memory shard records with the AWS Labs connector's record shape
  * (`data` binary + partitionKey/sequenceNumber/
  * approximateArrivalTimestamp). It exists so
  * `KinesisSource.readStream` — the one main-code line the sandbox
  * could never execute (no AWS endpoint, no connector jar) — runs
  * end-to-end through Spark's REAL streaming source API: format
  * resolution, option passing, micro-batch planning, and the
  * LogStream.parse pipeline downstream, with both of the reference's
  * iterator modes honored from the emitted options
  * (kinesis_logs_reader.py:69-77 — LATEST positions after the attach
  * clock, AT_TIMESTAMP parses the emitted timestamp with the emitted
  * timestampFormat and positions on arrival time).
  *
  * Canned state lives in the companion (driver JVM); correct in
  * local-mode tests only, which is this stub's entire scope.
  */
object FakeKinesis {
  final case class Rec(
      data: Array[Byte], partitionKey: String, sequenceNumber: String,
      arrival: Instant)

  /** Shard records in arrival order (the spec sets these). */
  @volatile var records: IndexedSeq[Rec] = IndexedSeq.empty

  /** The stream's "now" at attach: LATEST serves only records whose
    * arrival is strictly after this (the reference's LATEST iterator
    * tails new records only).
    */
  @volatile var attachInstant: Instant = Instant.EPOCH

  /** Options seen by the last attach (spec assertions). */
  @volatile var lastOptions: Map[String, String] = Map.empty

  val schema: StructType = StructType(Seq(
    StructField("data", BinaryType),
    StructField("streamName", StringType),
    StructField("partitionKey", StringType),
    StructField("sequenceNumber", StringType),
    StructField("approximateArrivalTimestamp", TimestampType)))
}

class FakeKinesisProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "aws-kinesis"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FakeKinesis.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new FakeKinesisTable(new CaseInsensitiveStringMap(properties))
}

class FakeKinesisTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String =
    s"fake_kinesis(${options.get("kinesis.streamName")})"
  override def schema(): StructType = FakeKinesis.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = FakeKinesis.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new FakeKinesisStream(options)
      }
    }
}

private case class FakeKinesisOffset(idx: Int) extends Offset {
  override def json(): String = idx.toString
}

private case class FakeKinesisPartition(idxs: Array[Int]) extends InputPartition

class FakeKinesisStream(opts: CaseInsensitiveStringMap) extends MicroBatchStream {
  import FakeKinesis._

  private val streamName = {
    val n = opts.get("kinesis.streamName")
    require(n != null && n.nonEmpty, "kinesis.streamName required")
    n
  }
  FakeKinesis.lastOptions = {
    import scala.jdk.CollectionConverters._
    opts.asCaseSensitiveMap().asScala.toMap
  }

  /** Starting index from the connector options — the two reference
    * iterator modes. AT_TIMESTAMP parses the emitted value with the
    * EMITTED timestampFormat (datetime spelling) or as epoch millis
    * (millis spelling), so a format/value mismatch in
    * KinesisSource.options fails the attach, like a real connector.
    */
  private val startIdx: Int = opts.get("kinesis.startingPosition") match {
    case "LATEST" =>
      records.indexWhere(_.arrival.isAfter(attachInstant)) match {
        case -1 => records.length
        case i => i
      }
    case "AT_TIMESTAMP" =>
      val raw = opts.get("kinesis.startingPosition.timestamp")
      require(raw != null, "AT_TIMESTAMP requires kinesis.startingPosition.timestamp")
      val t = Option(opts.get("kinesis.startingPosition.timestampFormat")) match {
        case Some(fmt) =>
          java.time.format.DateTimeFormatter.ofPattern(fmt)
            .withZone(java.time.ZoneOffset.UTC).parse(raw, Instant.from(_))
        case None => Instant.ofEpochMilli(raw.toLong)
      }
      records.indexWhere(r => !r.arrival.isBefore(t)) match {
        case -1 => records.length
        case i => i
      }
    case other =>
      throw new IllegalArgumentException(s"unsupported kinesis.startingPosition: $other")
  }

  override def initialOffset(): Offset = FakeKinesisOffset(startIdx)
  override def latestOffset(): Offset = FakeKinesisOffset(records.length)
  override def deserializeOffset(json: String): Offset = FakeKinesisOffset(json.toInt)

  /** One input partition per shard (partitionKey) present in the
    * range — the multi-shard parallel read whose merged result is what
    * the reference produces by round-robin iteration.
    */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FakeKinesisOffset].idx
    val e = end.asInstanceOf[FakeKinesisOffset].idx
    (s until e).groupBy(records(_).partitionKey).values
      .map(idxs => FakeKinesisPartition(idxs.toArray): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FakeKinesisReaderFactory(streamName)
  override def commit(offset: Offset): Unit = ()
  override def stop(): Unit = ()
}

class FakeKinesisReaderFactory(streamName: String)
  extends PartitionReaderFactory with Serializable {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val idxs = p.asInstanceOf[FakeKinesisPartition].idxs
      private var i = -1
      override def next(): Boolean = { i += 1; i < idxs.length }
      override def get(): InternalRow = {
        val r = FakeKinesis.records(idxs(i))
        new GenericInternalRow(Array[Any](
          r.data,
          UTF8String.fromString(streamName),
          UTF8String.fromString(r.partitionKey),
          UTF8String.fromString(r.sequenceNumber),
          r.arrival.toEpochMilli * 1000L))
      }
      override def close(): Unit = ()
    }
}
