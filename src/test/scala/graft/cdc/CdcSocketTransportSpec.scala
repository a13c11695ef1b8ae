package graft.cdc

import graft.SparkSpec
import java.io.PrintWriter
import java.net.ServerSocket
import org.apache.spark.sql.functions.col

/** Network-transport E2E: envelope lines served over a LIVE TCP socket,
  * consumed by `CdcSource.streamSocket` and run through the full
  * enrichment into a sink — proving the streaming wiring against a real
  * network source, not just file mocks. (A broker-backed Kafka e2e needs
  * broker jars this sandbox doesn't ship; the socket source exercises
  * the same one-string-column transport contract over an actual
  * connection.)
  */
class CdcSocketTransportSpec extends SparkSpec {

  private val envelope =
    """{"before":null,"after":{"id":%d,"name":"N%d","email":"n%d@net.example","created_at":1},"source":{"version":"v","connector":"postgresql","name":"dbserver1","ts_ms":5,"snapshot":"false","db":"inventory","schema":"public","table":"customers","txId":1,"lsn":%d},"op":"c","ts_ms":1763741884346}"""

  test("socket source → parse → enrich → memory sink over a real TCP connection") {
    val lines = (1 to 5).map(i => envelope.format(i, i, i, 100 + i)) :+ "garbage{{{"
    val server = new ServerSocket(0)
    @volatile var served = false
    val feeder = new Thread(() => {
      val sock = server.accept()
      val out = new PrintWriter(sock.getOutputStream, true)
      lines.foreach(out.println)
      out.flush()
      served = true
      // hold the connection open until the test closes the server —
      // the socket source treats disconnect as a stream failure
      while (!server.isClosed) Thread.sleep(50)
      sock.close()
    })
    feeder.setDaemon(true)
    feeder.start()

    val raw = CdcSource.streamSocket(spark, "localhost", server.getLocalPort)
    val enriched = Enrich(raw, EnrichConfig(processingTimeIso = Some("t")))
      .select(col("value"), col("value_out"))
    val query = enriched.writeStream
      .format("memory").queryName("sock_out").outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("sock_out").count() < lines.length &&
          System.currentTimeMillis() < deadline) {
        query.processAllAvailable()
        Thread.sleep(100)
      }
      val rows = spark.table("sock_out").collect()
        .map(r => r.getString(0) -> r.getString(1))
      assert(rows.length == lines.length,
        s"expected ${lines.length} rows over the socket, got ${rows.length}")
      val (bad, good) = rows.partition(_._1 == "garbage{{{")
      assert(good.length == 5 && good.forall(_._2.contains("\"enrichment\"")))
      assert(good.forall { case (in, out) => out.contains("\"original\"") })
      // passthrough contract holds over the network path too
      assert(bad.length == 1 && bad.head._2 == "garbage{{{")
      assert(served)
    } finally {
      query.stop()
      server.close()
    }
  }
}
