package graft

import org.apache.spark.sql.SparkSession

/** The `spark.sql.extensions` deployment path: a session built with
  * GraftExtensions resolves every graft_* function from plain SQL
  * with no library call.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("a session built withExtensions(GraftExtensions) resolves the SQL surface") {
    spark.sparkContext // ensure the shared context exists first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // reuses the running SparkContext; extensions apply because no
      // default session exists at build time
      val fresh = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(fresh ne spark) // really a new session, not the suite's
      // NO ensureRegistered call anywhere on this path
      val dot = fresh.sql(
        "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
          "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))")
        .head().getDouble(0)
      assert(dot === 11.0)
      val roundtrip = fresh.sql(
        "SELECT CAST(graft_gunzip(graft_gzip(CAST('hello graft' AS BINARY))) AS STRING)")
        .head().getString(0)
      assert(roundtrip === "hello graft")
      // the full surface resolves
      GraftSession.sqlFunctions.map(_._1).foreach { name =>
        assert(fresh.catalog.functionExists(name), s"$name not injected")
      }
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
