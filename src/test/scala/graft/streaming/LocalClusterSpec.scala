package graft.streaming

import graft.SparkTestBase

/** Forks [[LocalClusterStreamSmoke]] — the multi-executor streaming parity
  * gate. Needs a real Spark distro for the cluster Worker to spawn
  * executor JVMs from; self-skips (green) when none is present, same
  * discipline as KafkaBrokerSmoke. Forked for two reasons: the stateful
  * exec NPEs under sbt's test threads (see SparkTestBase.forkSmoke), and
  * the smoke builds its own sessions with non-test masters.
  */
class LocalClusterSpec extends SparkTestBase {

  private val sparkHome = sys.env.getOrElse("SPARK_HOME", "/opt/spark")

  test("KeyFlowTws changelog is bit-exact on a 2-executor local-cluster") {
    assume(new java.io.File(s"$sparkHome/jars").isDirectory,
      s"no Spark distro at $sparkHome — multi-executor smoke skipped")
    import scala.sys.process._
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cmd = Seq(javaBin) ++ graft.LocalClusterEnv.addOpensArgs ++ Seq(
      "-Xmx4g", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.streaming.LocalClusterStreamSmoke")
    val exit = Process(cmd, cwd = None,
      "SPARK_HOME" -> sparkHome, "SPARK_SCALA_VERSION" -> "2.13").!
    assert(exit == 0, "LocalClusterStreamSmoke failed — multi-executor " +
      "changelog parity broken (see stdout above)")
  }
}
