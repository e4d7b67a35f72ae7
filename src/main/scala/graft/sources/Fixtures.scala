package graft.sources

/** Resolves committed-fixture paths against a configurable base dir
  * so the catalog works from any checkout, not just /root/repo: the
  * `graft.base.dir` system property wins, then the
  * `SPARK_GRAFT_BASE_DIR` env var, then the default — the same
  * precedence sfDir already uses for the judged tables.
  */
object Fixtures {
  val BaseDir: String =
    sys.props.get("graft.base.dir")
      .orElse(sys.env.get("SPARK_GRAFT_BASE_DIR"))
      .getOrElse("/root/repo")

  def path(rel: String): String = s"$BaseDir/$rel"
}
