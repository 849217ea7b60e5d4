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

  /** Filesystem/catalog-safe key for a source dir. The sanitized prefix
    * stays readable; the appended hash of the RAW dir keeps distinct dirs
    * from colliding after sanitization ('sf0.01' vs 'sf0_01' — ADVICE
    * r14: a collision let a write-once memoization check and its table
    * identity diverge, silently reusing the wrong base). Every
    * write-once layout (bucketed tables, partitioned events, stored gram
    * sets, SCD2 bases) keys its table name AND its scratch path on this.
    */
  def dirKey(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(dir))
}
