package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Proves the spark.sql.extensions entry point: a FRESH session built
  * with `spark.sql.extensions=graft.functions.GraftExtensions` resolves
  * the native functions from plain SQL with no imperative register()
  * call — the deployment path a cluster job uses via --conf.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects the native functions into a new session") {
    val base = graft.TestSpark.spark // ensures a SparkContext exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // withExtensions = the same injection Spark runs for
    // `--conf spark.sql.extensions=graft.functions.GraftExtensions`; the
    // conf-string path only triggers when the SparkContext itself is
    // created with that static conf, which a shared test context isn't.
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions())
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      assert(s2 ne base) // a genuinely new session, not the shared one
      val sh = s2.sql("SELECT char_shingles('abcd', 2) AS sh")
        .head().getSeq[String](0)
      assert(sh === Seq("ab", "bc", "cd"))
      val dot = s2.sql(
        "SELECT vec_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>), " +
          "CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS d")
        .head().getDouble(0)
      assert(dot === 11.0)
      // same native expression the shared (imperatively registered)
      // session resolves — one implementation behind both paths
      val viaRegister = base.sql("SELECT char_shingles('abcd', 2)").head().getSeq[String](0)
      assert(viaRegister === sh)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
