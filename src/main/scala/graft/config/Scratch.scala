package graft.config

/** Scratch-space location for fixture staging and stream source
  * directories. Library code never hardcodes an absolute path: the
  * default lives under the JVM temp dir, qualified with the user name
  * so multi-user hosts don't collide on one world-shared path, and
  * `GRAFT_TMP_DIR` overrides it.
  */
object Scratch {
  def dir: String = sys.env.getOrElse("GRAFT_TMP_DIR", {
    val user = sys.props.getOrElse("user.name", "anon")
      .replaceAll("[^A-Za-z0-9_.-]", "_")
    sys.props.getOrElse("java.io.tmpdir", "/tmp") + s"/graft-scratch-$user"
  })

  /** Per-JVM scratch root under [[dir]], unique per process launch
    * (pid + start-time nonce) and removed on JVM exit. Every piece of
    * scratch state a query materializes MUST live under this root:
    * two processes profiling the same input (a bench overlapping a
    * verify, a retried verify) would otherwise interleave
    * destroy/commit/read cycles on one shared path and corrupt each
    * other's snapshots — the non-hermeticity behind the one flaky
    * correctness row of round 8.
    */
  lazy val runDir: String = {
    val pid = ProcessHandle.current().pid()
    val nonce = java.lang.Long.toHexString(System.nanoTime())
    val d = new java.io.File(dir, s"run-$pid-$nonce")
    d.mkdirs()
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
        f.delete(): Unit
      }
      try rm(d) catch { case _: Throwable => () } // best-effort cleanup
    }
    d.getAbsolutePath
  }
}
