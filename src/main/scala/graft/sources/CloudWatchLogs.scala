package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{graft_gunzip, graft_gzip, graft_try_gunzip}

/** CloudWatch Logs subscription payload model.
  *
  * A Kinesis record delivered by a CWL subscription carries a gzipped
  * JSON document: `{messageType, owner, logGroup, logStream,
  * subscriptionFilters, logEvents:[{id, timestamp, message,
  * extractedFields}]}`. The reference consumes exactly this shape
  * (reference: kinesis_logs_reader/kinesis_logs_reader.py:88-97,
  * tests/test_kinesis_logs_reader.py:36-46).
  */
object CloudWatchLogs {
  val DataMessage = "DATA_MESSAGE"
  val ControlMessage = "CONTROL_MESSAGE"

  val logEventSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("timestamp", LongType), // epoch millis
    StructField("message", StringType),
    StructField("extractedFields", MapType(StringType, StringType))))

  val payloadSchema: StructType = StructType(Seq(
    StructField("messageType", StringType),
    StructField("owner", StringType),
    StructField("logGroup", StringType),
    StructField("logStream", StringType),
    StructField("subscriptionFilters", ArrayType(StringType)),
    StructField("logEvents", ArrayType(logEventSchema))))

  /** Decode one gzipped payload column into the typed payload struct.
    * Narrow (per-row) transform: parallel over source partitions, no
    * shuffle — the 100 TB path is scan → gunzip → parse → filter,
    * all inside whole-stage codegen.
    */
  def decodePayload(data: Column): Column =
    from_json(graft_gunzip(data).cast("string"), payloadSchema)

  /** Like [[decodePayload]] but corrupt gzip records decode to NULL
    * (and are then dropped by the DATA_MESSAGE filter) instead of
    * failing the job.
    */
  def decodePayloadPermissive(data: Column): Column =
    from_json(graft_try_gunzip(data).cast("string"), payloadSchema)

  /** Build a payload struct (for tests / roundtrips / sinks); the
    * inverse of [[decodePayload]]. Mirrors the reference test
    * fixtures' `_data_message` (tests/test_kinesis_logs_reader.py:36-42).
    */
  def encodePayload(messageType: Column, logEvents: Column): Column =
    graft_gzip(
      to_json(struct(
        messageType.as("messageType"),
        logEvents.as("logEvents"))).cast("binary"))
}
