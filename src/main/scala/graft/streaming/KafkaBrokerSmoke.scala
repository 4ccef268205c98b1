package graft.streaming

import graft.fold.FoldOption
import org.apache.spark.sql.SparkSession

/** ENV-GATED real-broker end-to-end: the reference's golden stateful
  * pattern (persistence-kafka-it-tests/.../StatefulProcessingWithKafkaSpec
  * .scala:123-140 — produce → fold → restart → state recovered, counting
  * continues) against an actual Kafka broker through the actual
  * `spark.readStream.format("kafka")` source.
  *
  * This sandbox has NO Kafka artifact anywhere (verified round 9: no
  * kafka-clients / spark-sql-kafka jar in /opt/spark/jars, ivy, or
  * coursier caches), so by default the smoke prints a visible SKIPPED
  * line and exits 0 — the suite stays green while recording exactly what
  * is ungated. The day artifacts appear the surface self-proves:
  *
  *  - `SPARK_GRAFT_KAFKA_JARS` (':'-separated jars and/or directories; a
  *    directory means all jars in it): the spark-sql-kafka-0-10 connector
  *    + kafka-clients (+ their commons-pool2 / token-provider deps), and
  *    — unless a running broker is supplied — the full Kafka server libs
  *    (a distribution's `libs/` directory). The launching spec appends
  *    these to the forked JVM's classpath so the `kafka` source resolves.
  *  - `SPARK_GRAFT_KAFKA_BOOTSTRAP` (optional): `host:port` of an
  *    already-running broker. When absent, the smoke FORMATS and STARTS
  *    an in-process-machine KRaft broker as a child process (`kafka.Kafka
  *    server.properties`, storage formatted via the distribution's
  *    StorageTool — child processes, never in-JVM, because those mains
  *    call Exit.exit), waits for readiness, and tears it down.
  *
  * Pattern proven: produce {a×3, b×2} → fromKafka → KeyFlow count fold →
  * stop → produce {a×2, c×1} → RESTART from the same checkpoint →
  * recovered counts continue (a=5, c=1 — not a=2: state, not replay).
  * Exits 0 on SKIPPED or success; 1 with diagnostics otherwise.
  */
object KafkaBrokerSmoke {

  private def expandJars(spec: String): Seq[String] =
    spec.split(":").filter(_.nonEmpty).toSeq.map { p =>
      if (new java.io.File(p).isDirectory) s"$p/*" else p
    }

  def main(args: Array[String]): Unit = {
    val jars = sys.env.get("SPARK_GRAFT_KAFKA_JARS").filter(_.nonEmpty)
    val bootstrapEnv = sys.env.get("SPARK_GRAFT_KAFKA_BOOTSTRAP").filter(_.nonEmpty)
    if (jars.isEmpty && bootstrapEnv.isEmpty) {
      println("KAFKA_BROKER_E2E: SKIPPED — set SPARK_GRAFT_KAFKA_JARS " +
        "(connector + clients [+ server libs]) and optionally " +
        "SPARK_GRAFT_KAFKA_BOOTSTRAP to activate; no Kafka artifact exists " +
        "in this sandbox (verified r9)")
      sys.exit(0)
    }
    // preflight: activation without the client/connector artifacts on THIS
    // JVM's classpath can only fail — say exactly what is missing instead
    // of a generic red (the spec appends SPARK_GRAFT_KAFKA_JARS to the
    // fork classpath; a bootstrap-only env forgot the jars)
    try Class.forName("org.apache.kafka.clients.producer.KafkaProducer")
    catch {
      case _: ClassNotFoundException =>
        System.err.println("KAFKA_BROKER_E2E: MISCONFIGURED — activation " +
          "env set but kafka-clients is not on the classpath; set " +
          "SPARK_GRAFT_KAFKA_JARS to the connector + clients jars (the " +
          "launching spec appends them to the forked JVM)")
        println("KAFKA_BROKER_E2E: FAILED")
        sys.exit(1)
    }
    var broker: scala.sys.process.Process = null
    var exit = 1
    try {
      val bootstrap = bootstrapEnv.getOrElse {
        val (proc, addr) = startKraftBroker(jars.get)
        broker = proc
        addr
      }
      exit = runGoldenPattern(bootstrap)
    } catch {
      case e: Throwable =>
        System.err.println(s"KAFKA_BROKER_E2E: FAILED ${e.getClass.getName}: ${e.getMessage}")
        e.printStackTrace()
    } finally {
      if (broker != null) broker.destroy()
    }
    println(s"KAFKA_BROKER_E2E: ${if (exit == 0) "OK" else "FAILED"}")
    sys.exit(exit)
  }

  /** Format storage and start a single-node KRaft broker as child
    * processes from the supplied distribution jars. Returns the broker
    * process and its bootstrap address. */
  private def startKraftBroker(jarSpec: String): (scala.sys.process.Process, String) = {
    import scala.sys.process._
    val cp = expandJars(jarSpec).mkString(":")
    val javaBin = System.getProperty("java.home") + "/bin/java"
    def freePort(): Int = {
      val s = new java.net.ServerSocket(0)
      try s.getLocalPort finally s.close()
    }
    val (port, ctrlPort) = (freePort(), freePort())
    val logDir = java.nio.file.Files.createTempDirectory("graft-kraft").toString
    val cfg = java.nio.file.Files.createTempFile("graft-kraft", ".properties")
    java.nio.file.Files.writeString(cfg,
      s"""process.roles=broker,controller
         |node.id=1
         |controller.quorum.voters=1@localhost:$ctrlPort
         |listeners=PLAINTEXT://localhost:$port,CONTROLLER://localhost:$ctrlPort
         |advertised.listeners=PLAINTEXT://localhost:$port
         |controller.listener.names=CONTROLLER
         |inter.broker.listener.name=PLAINTEXT
         |listener.security.protocol.map=PLAINTEXT:PLAINTEXT,CONTROLLER:PLAINTEXT
         |log.dirs=$logDir
         |num.partitions=2
         |offsets.topic.replication.factor=1
         |transaction.state.log.replication.factor=1
         |transaction.state.log.min.isr=1
         |group.initial.rebalance.delay.ms=0
         |auto.create.topics.enable=true
         |""".stripMargin)
    val clusterId = java.util.UUID.randomUUID().toString.replace("-", "").take(22)
    // storage format: the tool's main calls Exit.exit — child process only.
    // Class name moved across Kafka majors; try both.
    val formatted = Seq("kafka.tools.StorageTool", "org.apache.kafka.tools.StorageTool")
      .exists { cls =>
        Process(Seq(javaBin, "-cp", cp, cls,
          "format", "-t", clusterId, "-c", cfg.toString)).! == 0
      }
    require(formatted, "KRaft storage format failed under both StorageTool class names")
    val broker = Process(Seq(javaBin, "-Xmx1g", "-cp", cp, "kafka.Kafka", cfg.toString)).run(
      ProcessLogger(_ => (), l => System.err.println(s"[kraft] $l")))
    // readiness: a plain TCP connect to the listener
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    var up = false
    while (!up && System.nanoTime() < deadline) {
      require(broker.isAlive(), "KRaft broker process died during startup")
      try {
        val s = new java.net.Socket("localhost", port)
        s.close(); up = true
      } catch { case _: java.io.IOException => Thread.sleep(250) }
    }
    require(up, s"KRaft broker did not open localhost:$port within 60 s")
    (broker, s"localhost:$port")
  }

  /** Produce via reflection (kafka-clients is on the forked classpath,
    * never on the compile classpath). */
  private def produce(bootstrap: String, topic: String,
                      records: Seq[(String, String)]): Unit = {
    val props = new java.util.Properties()
    props.put("bootstrap.servers", bootstrap)
    props.put("key.serializer", "org.apache.kafka.common.serialization.StringSerializer")
    props.put("value.serializer", "org.apache.kafka.common.serialization.StringSerializer")
    val pCls = Class.forName("org.apache.kafka.clients.producer.KafkaProducer")
    val rCls = Class.forName("org.apache.kafka.clients.producer.ProducerRecord")
    val producer = pCls.getConstructor(classOf[java.util.Properties])
      .newInstance(props)
    val send = pCls.getMethod("send", rCls)
    val rCtor = rCls.getConstructor(classOf[String], classOf[Object], classOf[Object])
    try {
      records.foreach { case (k, v) =>
        send.invoke(producer, rCtor.newInstance(topic, k, v).asInstanceOf[Object])
      }
      pCls.getMethod("flush").invoke(producer)
    } finally pCls.getMethod("close").invoke(producer)
  }

  /** The golden pattern itself. Returns 0 on success. */
  private def runGoldenPattern(bootstrap: String): Int = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val topic = s"graft-e2e-${System.currentTimeMillis()}"
    val ckpt = java.nio.file.Files.createTempDirectory("kafkae2e-ckpt").toString
    val fold = FoldOption.of[Long, graft.model.Record](_ => 1L)((n, _) => n + 1)

    def runQuery(sinkName: String): org.apache.spark.sql.streaming.StreamingQuery =
      KeyFlowTws.flow(
          KafkaFlowSpark.fromKafka(spark, bootstrap, topic), fold)
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()

    def latestCounts(sinkName: String): Map[String, Long] =
      spark.table(sinkName).as[KeyOutput[Long]]
        .collect().groupBy(_.key)
        .map { case (k, rows) => k -> rows.maxBy(_.offset).state.getOrElse(-1L) }

    // phase 1: produce, fold, assert
    produce(bootstrap, topic, Seq("a" -> "1", "a" -> "2", "b" -> "1", "a" -> "3", "b" -> "2"))
    val q1 = runQuery("kafkae2e1")
    val deadline1 = System.nanoTime() + 90L * 1000 * 1000 * 1000
    var c1 = Map.empty[String, Long]
    while (c1 != Map("a" -> 3L, "b" -> 2L) && System.nanoTime() < deadline1) {
      q1.processAllAvailable(); c1 = latestCounts("kafkae2e1")
      if (c1 != Map("a" -> 3L, "b" -> 2L)) Thread.sleep(500)
    }
    q1.stop()
    if (c1 != Map("a" -> 3L, "b" -> 2L)) {
      System.err.println(s"phase-1 counts wrong: $c1"); spark.stop(); return 1
    }

    // phase 2: more records, RESTART from the same checkpoint — counts
    // must CONTINUE from recovered state, not restart from replay
    produce(bootstrap, topic, Seq("a" -> "4", "c" -> "1", "a" -> "5"))
    val q2 = runQuery("kafkae2e2")
    val want = Map("a" -> 5L, "c" -> 1L) // b untouched post-restart → absent in update-mode sink
    val deadline2 = System.nanoTime() + 90L * 1000 * 1000 * 1000
    var c2 = Map.empty[String, Long]
    while (c2 != want && System.nanoTime() < deadline2) {
      q2.processAllAvailable(); c2 = latestCounts("kafkae2e2")
      if (c2 != want) Thread.sleep(500)
    }
    q2.stop()
    spark.stop()
    if (c2 != want) { System.err.println(s"phase-2 counts wrong: $c2"); return 1 }
    println(s"KAFKA_BROKER_E2E counts: phase1=$c1 phase2=$c2 (restart continued, no replay)")
    0
  }
}
