package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("graft_dot and graft_cosine are SQL-callable via SparkSessionExtensions") {
    // Force a NEW SparkSession (sharing the JVM's SparkContext): getOrCreate
    // would silently reuse the shared test session, where the extension was
    // never applied. Restore the previous sessions afterwards; do not stop()
    // (that would kill the shared context).
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(ext => new graft.expressions.GraftExtensions()(ext))
      .getOrCreate()
    try {
      val row = s.sql(
        """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
           round(graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)), 6) AS c,
           graft_cosine(array(0.0d, 0.0d), array(1.0d, 0.0d)) AS z""").head()
      assert(row.getDouble(0) == 11.0)
      assert(row.getDouble(1) == 1.0)
      assert(row.isNullAt(2))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
