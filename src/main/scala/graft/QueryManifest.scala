package graft

/** Renders [[SparkEntry.queryManifest]] as the committed
  * QUERY_MANIFEST.json (VERDICT r14 #8) — one sorted `"name":
  * "gate-class"` line per registered query, so registry changes show
  * up as one-line diffs in review and the round artifacts
  * (CORRECTNESS_r*.json vs BENCH_r*.json row counts) reconcile
  * against a committed file instead of a source dive.
  *
  * Regenerate after any registry change:
  *
  *   tools/run.sh graft.QueryManifest
  *
  * QueryManifestSpec fails the build when the committed file lags the
  * live registry.
  */
object QueryManifest {

  def render: String = {
    val entries = SparkEntry.queryManifest.toSeq.sortBy(_._1)
      .map { case (k, v) => s"""  "$k": "$v"""" }
    entries.mkString("{\n", ",\n", "\n}\n")
  }

  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "QUERY_MANIFEST.json"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path), render)
    println(s"wrote $path (${SparkEntry.queryManifest.size} entries)")
  }
}
