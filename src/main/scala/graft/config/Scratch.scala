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
}
