package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{DotQ, L2Q, MinHash16, Shingle3, SimHash16}

/** `spark.sql.extensions` entry point — the deployment-grade way to ship
  * this library's native expressions: a cluster operator sets
  *
  * {{{ spark.sql.extensions=graft.GraftExtensions }}}
  *
  * and every session (including ones created by notebooks, Thrift server
  * connections, or structured-streaming jobs the operator doesn't control)
  * has `graft_simhash16`, `graft_minhash16`, `graft_dotq`, `graft_l2q`,
  * and `graft_shingle3` available in SQL text — no per-session
  * `GraftFunctions.register` call required. Injection happens at session
  * BUILD time through the extensions hook, the same mechanism Delta/
  * Iceberg use to install their parsers and rules; the in-process
  * `GraftFunctions.register` path remains for library callers that own
  * their session. Both paths bind the identical expression builders, so
  * a query's plan is byte-identical whichever way the function arrived.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  /** Arity gate at analysis time: a builder that blindly indexes
    * `exprs` turns `graft_dotq('x')` into a raw
    * IndexOutOfBoundsException and silently IGNORES surplus arguments
    * (`graft_simhash16(a, b)` would bind `a` and drop `b`) — both are
    * analysis errors and must fail as such, naming the function. */
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != n) throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> name, "expectedNum" -> n.toString,
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
      build(exprs)
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_simhash16"),
      info("graft_simhash16"),
      arity("graft_simhash16", 1)(exprs => SimHash16(exprs.head))))
    ext.injectFunction((FunctionIdentifier("graft_minhash16"),
      info("graft_minhash16"),
      arity("graft_minhash16", 1)(exprs => MinHash16(exprs.head))))
    ext.injectFunction((FunctionIdentifier("graft_dotq"),
      info("graft_dotq"),
      arity("graft_dotq", 2)(exprs => DotQ(exprs(0), exprs(1)))))
    ext.injectFunction((FunctionIdentifier("graft_l2q"),
      info("graft_l2q"),
      arity("graft_l2q", 2)(exprs => L2Q(exprs(0), exprs(1)))))
    ext.injectFunction((FunctionIdentifier("graft_shingle3"),
      info("graft_shingle3"),
      arity("graft_shingle3", 1)(exprs => Shingle3(exprs.head))))
  }
}
