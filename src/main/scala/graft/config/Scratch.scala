package graft.config

/** Scratch-space location for fixture staging and stream source
  * directories. Library code never hardcodes an absolute path: the
  * default lives under the JVM temp dir and `GRAFT_TMP_DIR` overrides
  * it (the harness sets nothing and gets a per-user tmp location).
  */
object Scratch {
  def dir: String = sys.env.getOrElse("GRAFT_TMP_DIR",
    sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-scratch")
}
