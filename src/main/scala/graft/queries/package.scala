package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the driver-facing query catalog. */
package object queries {
  /** Query: (session, sf-dir) → result DataFrame. */
  type Q = (SparkSession, String) => DataFrame

  def table(s: SparkSession, dir: String, name: String): DataFrame = {
    // The driver's events table carries TIMESTAMP(NANOS), which Spark 4
    // rejects by default; read nanos as long and convert explicitly.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/$name.parquet")
  }

  /** `events` with ts normalized: ts_ns (long), ts_ms (long, floored),
    * ts (TimestampType, microsecond precision — what DuckDB's
    * `ts::TIMESTAMP` yields too). Adapts to either physical schema the
    * driver has generated: INT64 epoch-nanos (read as long via
    * nanosAsLong) or timestamp[us] (naive = UTC wall clock; the
    * session timezone is pinned to UTC everywhere, so the NTZ→LTZ
    * cast is instant-preserving and agrees with DuckDB's epoch_ns on
    * a naive TIMESTAMP).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = table(s, dir, "events")
    val tsAsNs: Column = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => col("ts")
      case _ => unix_micros(col("ts").cast("timestamp")) * lit(1000L)
    }
    // keep ts_ns in ts's original column position, ts_ms/ts appended —
    // the exact shape the int64-nanos path has always produced
    raw.select(raw.columns.map {
        case "ts" => tsAsNs.as("ts_ns")
        case c    => col(c)
      }.toSeq: _*)
      .withColumn("ts_ms", expr("ts_ns div 1000000"))
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }

  /** Exact decimal cast used before sums so Spark and DuckDB agree
    * bit-for-bit (no fp associativity).
    */
  def dec(c: Column): Column = c.cast("decimal(18,4)")

  /** Deterministic QC-sample percentage for the deliberately-quadratic
    * ground-truth rows (d4/d5/d7/d13/d14/d18/d21/d22/d23 — all-pairs
    * oracles, tractable at the sf0.01 gate by design) plus
    * s6_knn_join_auto (whose Spark cost is linear-with-log but whose
    * DuckDB replay pays per-pair list-lambda cosines) and m7/m8 (whose
    * chunker replay pays DuckDB recursion per payload byte). Unset
    * (the driver's gate, the default) = full corpus, unchanged
    * semantics.
    * `SPARK_GRAFT_QC_SAMPLE_PCT=p` restricts those rows — Spark query
    * AND dumped oracle SQL alike — to the md5-bucket p% of documents
    * (d16/d20's sampling shape: pair work scales ~p²), which is what
    * makes a 100×-scale (sf1) ORACLE replay of the quadratic family
    * terminate instead of timing out. Sample selection is md5-bucket
    * deterministic, so both engines pick the identical subset.
    */
  def qcSamplePct: Option[Int] =
    sys.env.get("SPARK_GRAFT_QC_SAMPLE_PCT").map(_.trim).filter(_.nonEmpty)
      .map(parseQcSamplePct)

  /** Fail-fast parse: an operator who SET the var but mistyped it
    * must not silently get the full quadratic corpus (the opposite of
    * what they asked for). */
  private[graft] def parseQcSamplePct(s: String): Int = {
    val p = try s.toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"SPARK_GRAFT_QC_SAMPLE_PCT must be an integer in [1, 99], got '$s'")
    }
    require(p >= 1 && p <= 99,
      s"SPARK_GRAFT_QC_SAMPLE_PCT must be in [1, 99], got $p " +
        "(0 or 100 would silently run the FULL quadratic corpus; unset the var for that)")
    p
  }

  /** Spark side of the QC sample, id-keyed (embeddings): md5-bucket
    * filter on the id column (exact twin of the SQL predicate in
    * [[qcSampledSql]] with an id key). */
  def qcSampled(df: DataFrame, idCol: String): DataFrame =
    qcSamplePct.fold(df)(p =>
      df.where(graft.functions.hashShard(col(idCol), 100) < p))

  /** Spark side of the QC sample, CONTENT-keyed (documents): the
    * bucket key is the first 32 chars of the normalized text, not the
    * id — near-duplicates share their normalized prefix (measured:
    * 25/25 of the generator's J≥0.5 pairs at sf0.01), so a pair's
    * endpoints land in the same bucket and pairs survive at rate ~p
    * instead of the p² an id-keyed sample inflicts on pair statistics
    * (an id-keyed 2% sf1 replay passed d4/d7/d21 with ZERO surviving
    * pairs — a pipeline check, not an algorithm check). */
  def qcSampledByText(df: DataFrame, textCol: String = "text"): DataFrame =
    qcSamplePct.fold(df)(p =>
      df.where(pmod(
        conv(substring(md5(qcTextKey(col(textCol))), 1, 7), 16, 10).cast("long"),
        lit(100L)) < p))

  private def qcTextKey(text: Column): Column =
    substring(trim(regexp_replace(lower(text), "\\s+", " ")), 1, 32)

  /** DuckDB twin of [[qcTextKey]]. */
  val qcTextKeySql: String =
    "substr(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, 32)"

  /** Oracle side of the QC sample: rewrite `FROM <table>` to an inline
    * sampled view over md5(keySqlExpr) buckets. Only `FROM <table>`
    * source references are rewritten (an id-join lookup like `JOIN
    * documents da ON pr.id_a = da.doc_id` over already-sampled pair
    * ids is correct either way); a following table alias stays valid
    * because the subquery takes its place. The rewrite is
    * word-boundary anchored (case-insensitive, any whitespace between
    * FROM and the name), so a longer table name sharing the prefix
    * (`FROM documents_meta`) is never corrupted; a sampled-family SQL
    * in which the table never appears as a FROM source fails loudly
    * instead of silently replaying the full quadratic corpus. */
  def qcSampledSql(sql: String, tableName: String, keySqlExpr: String): String =
    qcSamplePct.fold(sql)(sampledSqlAt(sql, tableName, keySqlExpr, _))

  private[graft] def sampledSqlAt(
      sql: String, tableName: String, keySqlExpr: String, p: Int): String = {
    val pat = ("(?i)\\bFROM\\s+" + java.util.regex.Pattern.quote(tableName) + "\\b").r
    val rewritten = pat.replaceAllIn(sql, _ => java.util.regex.Matcher.quoteReplacement(
      s"FROM (SELECT * FROM $tableName WHERE ('0x' || substr(md5($keySqlExpr), 1, 7))::BIGINT % 100 < $p)"))
    require(rewritten != sql,
      s"qcSampledSql: no 'FROM $tableName' source found to sample in oracle SQL")
    rewritten
  }

  /** DuckDB replay of graft_simhash64 over a `(id, tok)` relation
    * named `tk`: per-token 64-bit hash = first 16 hex chars of
    * md5(tok) as two 32-bit halves (SimHashOps.hash64 takes the first
    * 8 digest bytes big-endian, so the halves line up exactly), then
    * +1/-1 votes per bit position, sign → nibble → uppercase
    * 16-hex-digit fingerprint column `simhash` keyed by `id`.
    */
  val simhashReplaySql: String =
    """h AS (
      |  SELECT id,
      |    ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hi,
      |    ('0x' || substr(md5(tok), 9, 8))::BIGINT AS lo
      |  FROM tk
      |), bits AS (
      |  SELECT id, bb.b AS b,
      |    sum(CASE WHEN ((CASE WHEN bb.b < 32 THEN lo ELSE hi END >> (bb.b % 32)) & 1) = 1
      |        THEN 1 ELSE -1 END) AS v
      |  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) bb
      |  GROUP BY 1, 2
      |), nibs AS (
      |  SELECT id, b // 4 AS nib,
      |    sum(CASE WHEN v > 0 THEN 1 << (b % 4) ELSE 0 END) AS nv
      |  FROM bits GROUP BY 1, 2
      |), fp AS (
      |  SELECT id,
      |    string_agg(substr('0123456789ABCDEF', (nv + 1)::INT, 1), '' ORDER BY nib DESC) AS simhash
      |  FROM nibs GROUP BY id
      |)""".stripMargin
}
