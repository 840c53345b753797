package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2.6): treat image/audio/video
  * payloads as opaque `binary` columns with typed metadata, and
  * process them in fixed-size frames.
  *
  * The *decode* step is STUBBED — this container has no media codecs —
  * with a deterministic fake (md5 of the frame bytes as the "feature",
  * byte-sum as the "energy"). Everything Spark-side is real: the
  * binary column, the frame/stride arithmetic, the per-partition batch
  * iteration, and the output schema a real decoder would produce.
  */
object BinaryOps {

  val FrameBytes = 256

  /** Typed metadata for an opaque binary payload: byte length, a
    * sniffed format tag (magic-prefix heuristic), and the number of
    * fixed-size frames it splits into.
    */
  def withMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(binCol)))
      .withColumn("format",
        when(substr(col(binCol), lit(1), lit(3)) === lit("the".getBytes), "type_the")
          .when(substr(col(binCol), lit(1), lit(2)) === lit("a ".getBytes), "type_a")
          .otherwise("type_raw"))
      .withColumn("n_frames",
        floor((col("n_bytes").cast("long") + (FrameBytes - 1)) / FrameBytes).cast("long"))

  /** Sample every `stride`-th fixed-size frame: one output row per
    * sampled frame with its offset, byte slice, and stubbed features.
    * Pure column ops (codegen'd) — the shape a real frame decoder
    * would fan out to.
    */
  def sampleFrames(df: DataFrame, binCol: String, idCol: String, stride: Int): DataFrame =
    withMeta(df, binCol)
      .select(col(idCol).as("id"), col(binCol).as("bin"), col("n_bytes"), col("n_frames"))
      .withColumn("frame_idx",
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong))))
      .withColumn("frame_off", col("frame_idx") * FrameBytes)
      .withColumn("frame", substr(col("bin"), col("frame_off") + 1, lit(FrameBytes)))
      // STUB decode: md5 stands in for the real feature extractor
      .withColumn("frame_feature", md5(col("frame")))
      .withColumn("frame_len", length(col("frame")))
      .select("id", "frame_idx", "frame_off", "frame_len", "frame_feature")

  /** Binary near-dup fingerprint: 64-bit SimHash over the payload's
    * overlapping byte-4-gram tokens (hex-encoded) — the binary twin of
    * the text pipeline's d3. Payloads differing in a few bytes land
    * within small Hamming distance; bucketing/verification then reuse
    * the text dedup machinery unchanged.
    */
  def simhashBinary(df: DataFrame, binCol: String, idCol: String): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"), hex(col(binCol)).as("hx"))
      .withColumn("toks", transform(
        sequence(lit(1), greatest(lit(1), length(col("hx")) - 7), lit(2)),
        i => col("hx").substr(i, lit(8))))
      .select(col("id"),
        lpad(hex(graft.functions.simhash64(col("toks"))), 16, "0").as("simhash"))

  /** Per-partition batch "decoder" — the mapPartitions shape a real
    * codec binding would use (one codec instance per partition, rows
    * streamed through it). Decode itself is the deterministic stub.
    */
  case class DecodedFrame(id: Long, frameIdx: Int, energy: Long)

  def decodePartitions(frames: Dataset[(Long, Int, Array[Byte])]): Dataset[DecodedFrame] = {
    import frames.sparkSession.implicits._
    frames.mapPartitions { it =>
      // real binding would initialize the codec once per partition here
      it.map { case (id, idx, bytes) =>
        var e = 0L
        var i = 0
        while (i < bytes.length) { e += (bytes(i) & 0xff); i += 1 }
        DecodedFrame(id, idx, e % 100000L)
      }
    }
  }
}
