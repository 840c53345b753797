package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CLI-parity TSV rendering (reference: __main__.py:10-24): a
  * sorted-key header line followed by one tab-joined line per log
  * event, missing keys rendered empty.
  *
  * The reference peeks at the first row to discover the key set; we
  * collect the distinct key set instead (driver-side, but bounded by
  * the schema size — i.e. #distinct field names, not #rows — so it
  * stays O(tens) even at 100 TB).
  */
object Tsv {

  /** flat: output of Reader.readLogs (has `fields: map<string,string>`).
    * Returns a single-column DataFrame `line` = header + data rows.
    */
  def render(flat: DataFrame): DataFrame = {
    val spark = flat.sparkSession
    import spark.implicits._
    val keys = flat
      .select(explode(map_keys(col("fields"))).as("k"))
      .distinct().as[String].collect().sorted
    val header = spark.createDataset(Seq(keys.mkString("\t"))).toDF("line")
    val rows = flat.select(
      concat_ws("\t", keys.map(k => coalesce(col("fields").getItem(k), lit(""))): _*)
        .as("line"))
    header.unionAll(rows)
  }
}
