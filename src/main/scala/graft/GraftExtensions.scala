package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.GraftFunctions

/** Session-extension installer — the deployment path for sessions the
  * library does not construct itself:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  *   // or programmatically:
  *   SparkSession.builder().withExtensions(new GraftExtensions) …
  *
  * Injects every native function from [[GraftFunctions.builders]]
  * into the session's function registry at build time, so SQL-only
  * users (JDBC, notebooks, Thrift server) can call `vector_dot`,
  * `minhash_signature`, etc. without any Scala entry point — plus ONE
  * resolution rule, [[org.apache.spark.sql.graft.GraftMergeRule]],
  * which rewrites SQL `MERGE INTO` statements whose target is a
  * graft table onto the engine's own merge verb (stock Spark rejects
  * MERGE against V1 relations outright). Built-in rules and
  * strategies are otherwise NOT overridden: every graft operator
  * plans through stock Catalyst, and the extension surface stays
  * additive (the merge rule only ever touches plans no stock rule
  * could execute anyway).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
    ext.injectResolutionRule(
      org.apache.spark.sql.graft.GraftMergeRule(_))
    // analysis-time resolution of the table_changes TVF placeholder
    // (the parser stays thin — round-14 advice): catalog binding,
    // head-version resolution and the delta-sized CDF read plan all
    // happen here, never in the parser
    ext.injectResolutionRule(
      org.apache.spark.sql.graft.GraftTableChangesRule(_))
    // ALTER TABLE + time travel cannot ride a resolution rule
    // (ResolveSessionCatalog throws on the V1 node earlier in the
    // same batch) — they rewrite at PARSE time instead; every
    // non-graft statement passes through the delegate byte-identical
    ext.injectParser((session, delegate) =>
      new org.apache.spark.sql.graft.GraftSqlParser(session, delegate))
  }
}
