package graft.tmpdebug
object DebugEnv {
  def main(args: Array[String]): Unit =
    println("SPARK_HOME_SEEN=" + sys.env.getOrElse("SPARK_HOME", "<unset>"))
}
