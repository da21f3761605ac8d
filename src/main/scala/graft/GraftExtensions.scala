package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.expressions.GraftFunctions

/** `spark.sql.extensions` entry point — the deployment-grade way to ship
  * this library's native expressions: a cluster operator sets
  *
  * {{{ spark.sql.extensions=graft.GraftExtensions }}}
  *
  * and every session (including ones created by notebooks, Thrift server
  * connections, or structured-streaming jobs the operator doesn't control)
  * has `graft_simhash16`, `graft_minhash16`, `graft_dotq`, `graft_l2q`,
  * `graft_shingle3`, and `graft_nfc` available in SQL text — no per-session
  * `GraftFunctions.register` call required. Injection happens at session
  * BUILD time through the extensions hook, the same mechanism Delta/
  * Iceberg use to install their parsers and rules; the in-process
  * `GraftFunctions.register` path remains for library callers that own
  * their session. Both paths bind the ONE builder table
  * (`GraftFunctions.builders`, arity-gated at analysis time), so a
  * query's plan — and its error behavior — is byte-identical whichever
  * way the function arrived.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, n, build) =>
      ext.injectFunction((FunctionIdentifier(name), info(name),
        GraftFunctions.arityChecked(name, n)(build)))
    }
}
