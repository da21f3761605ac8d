package graft

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/** The extensions hook must install every native function into a session
  * built with spark.sql.extensions=graft.GraftExtensions, and the results
  * must match the in-process GraftFunctions.register path exactly. */
class GraftExtensionsSpec extends SparkSpec {

  test("the extensions hook installs the graft functions at session build") {
    // spark.sql.extensions is a STATIC SQL conf — it binds when the FIRST
    // session in the JVM is built, so an in-JVM spec exercises the same
    // injection through builder.withExtensions (getOrCreate composes the
    // static-conf extensions and the builder's into one apply; the class
    // under test is identical either way)
    spark.sparkContext
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val withExt = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions().apply(_))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
      val q = "SELECT graft_simhash16(graft_shingle3('alpha beta gamma delta')) AS h, " +
        "size(graft_shingle3('alpha beta gamma delta')) AS n"
      val viaExt = withExt.sql(q).collect().head
      // same answers as the registry path on the shared session
      graft.expressions.GraftFunctions.register(spark)
      val viaReg = spark.sql(q).collect().head
      assert(viaExt.getLong(0) == viaReg.getLong(0))
      assert(viaExt.getInt(1) == viaReg.getInt(1) && viaExt.getInt(1) == 2)
      val dot = withExt.sql(
        "SELECT graft_dotq(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d")
        .collect().head.getLong(0)
      assert(dot > 0, "quantized dot must be positive for positive vectors")
      // arity gate (r10): wrong argument counts must fail ANALYSIS with
      // the function named — not IndexOutOfBounds (missing arg) and not
      // silent truncation (surplus arg)
      def analysisError(sql: String): String =
        intercept[org.apache.spark.sql.AnalysisException] {
          withExt.sql(sql).collect()
        }.getMessage
      assert(analysisError("SELECT graft_dotq(array(1.0f))")
        .contains("graft_dotq"), "missing-arg error must name the function")
      assert(analysisError(
        "SELECT graft_simhash16(graft_shingle3('a b c'), 2)")
        .contains("graft_simhash16"),
        "surplus-arg must be an analysis error, not silently dropped")
      // the in-process register path shares the SAME gated builders
      graft.expressions.GraftFunctions.register(spark)
      val viaRegErr = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT graft_l2q(array(1.0f))").collect()
      }.getMessage
      assert(viaRegErr.contains("graft_l2q"),
        "register path must raise the identical arity error")
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
