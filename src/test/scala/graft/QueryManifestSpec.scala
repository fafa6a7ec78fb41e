package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the committed QUERY_MANIFEST.json to the LIVE registry
  * (VERDICT r14 #8): the round artifacts' row counts
  * (CORRECTNESS_r*.json = oracle-gated queries, BENCH_r*.json
  * n_registered = queries + bench-only) must reconcile against a
  * committed file mechanically. A registry change without a manifest
  * regeneration fails here with the exact regeneration command.
  * No SparkSession needed — the registry maps are pure values.
  */
class QueryManifestSpec extends AnyFunSuite {

  test("committed QUERY_MANIFEST.json matches the live registry " +
      "(regenerate with tools/run.sh graft.QueryManifest)") {
    val committed = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("QUERY_MANIFEST.json")), "UTF-8")
    assert(committed == QueryManifest.render,
      "QUERY_MANIFEST.json lags the live registry — run " +
        "`tools/run.sh graft.QueryManifest` and commit the result")
  }

  test("registry invariants: oracle SQL only for registered queries, " +
      "contract twins oracle-backed, bench-only names disjoint") {
    val qs = SparkEntry.queries.keySet
    val bench = SparkEntry.benchOnlyQueries.keySet
    // an oracle without a query would silently never run
    val orphanOracles = SparkEntry.oracleSql.keySet -- qs
    assert(orphanOracles.isEmpty,
      s"oracle SQL with no registered query: $orphanOracles")
    // a bench-only name shadowing a gated query would double-count
    assert((qs & bench).isEmpty, qs & bench)
    // every bench-only query's accuracy pin must itself be
    // oracle-gated, or the pin pins nothing
    bench.foreach { b =>
      val twin = SparkEntry.contractTwinOf(b)
      assert(SparkEntry.oracleSql.contains(twin),
        s"bench-only $b names contract twin $twin which has no oracle")
    }
  }
}
