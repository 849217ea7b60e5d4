package graft

/** Scratch locations for layout-producing operators (bucketed tables,
  * partitioned writes). Everything lands under the build's `target/`
  * directory — absolute, so plans are independent of where Spark was
  * launched from — and is safe to delete between runs (every producer
  * writes with mode=overwrite). Override with `GRAFT_SCRATCH` when the
  * build tree is read-only.
  */
object BuildPaths {
  private val root: String =
    sys.env.getOrElse("GRAFT_SCRATCH", s"${sys.props("user.dir")}/target/graft-scratch")

  def scratch(sub: String): String = s"$root/$sub"
}
