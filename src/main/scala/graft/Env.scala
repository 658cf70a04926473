package graft

/** Validated environment lookups shared by the runnable mains. */
object Env {
  /** `SPARK_GRAFT_CPUS`, validated: a malformed or non-positive value
    * falls back to `default` with a stderr note instead of crashing the
    * tool with a raw NumberFormatException.
    */
  def cpus(default: Int): Int =
    sys.env.get("SPARK_GRAFT_CPUS") match {
      case Some(v) =>
        v.trim.toIntOption.filter(_ > 0).getOrElse {
          System.err.println(
            s"[graft] ignoring malformed SPARK_GRAFT_CPUS='$v'; using $default")
          default
        }
      case None => default
    }
}
