package graft.cdc

import graft.SparkSpec
import java.sql.Timestamp

/** Kafka-transport contract, spec-tested without a broker: a mocked
  * DataFrame carrying Kafka's exact source schema (key/value binary, topic,
  * partition, offset, timestamp, timestampType) goes through
  * [[CdcSource.projectKafka]] and the full enrichment, and the Kafka
  * metadata lands in P16 `processing_metadata`. The broker-side runbook is
  * documented on [[CdcSource.streamKafka]].
  */
class CdcSourceSpec extends SparkSpec {

  private val envelope =
    """{"before":null,"after":{"id":7,"name":"Kay","email":"kay@k.org","created_at":1},"source":{"version":"v","connector":"postgresql","name":"dbserver1","ts_ms":5,"snapshot":"false","db":"inventory","schema":"public","table":"customers","txId":1,"lsn":2},"op":"c","ts_ms":1763741884346}"""

  /** Kafka source relation schema, as `format("kafka").load()` produces. */
  private def kafkaRecords = {
    import spark.implicits._
    Seq(
      (Array.empty[Byte], envelope.getBytes("UTF-8"),
        "dbserver1.public.customers", 3, 42L,
        new Timestamp(1763741884346L), 0),
      (Array.empty[Byte], "not-json{{{".getBytes("UTF-8"),
        "dbserver1.public.customers", 1, 43L,
        new Timestamp(1763741884347L), 0)
    ).toDF("key", "value", "topic", "partition", "offset", "timestamp",
      "timestampType")
  }

  test("projectKafka decodes value and builds topic/partition/message_id") {
    val out = CdcSource.projectKafka(kafkaRecords).collect()
    assert(out.length == 2)
    val r = out.find(_.getString(0).startsWith("{")).get
    assert(r.getString(0) == envelope) // bytes → string round-trip
    assert(r.getString(1) == "dbserver1.public.customers")
    assert(r.getInt(2) == 3)
    assert(r.getString(3) == "dbserver1.public.customers:3:42")
  }

  test("Kafka metadata flows into P16 processing_metadata through Enrich") {
    val enriched = Enrich(CdcSource.projectKafka(kafkaRecords),
      EnrichConfig(processingTimeIso = Some("t")))
    val good = enriched.filter(org.apache.spark.sql.functions.col("envelope").isNotNull)
      .selectExpr("enrichment.processing_metadata.topic",
        "enrichment.processing_metadata.partition_id",
        "enrichment.processing_metadata.message_id",
        "value_out")
      .collect()(0)
    assert(good.getString(0) == "dbserver1.public.customers")
    assert(good.getString(1) == "3")
    assert(good.getString(2) == "dbserver1.public.customers:3:42")
    assert(good.getString(3).contains("\"message_id\":\"dbserver1.public.customers:3:42\""))
    // invalid record still passes through raw, Kafka metadata or not
    val bad = enriched.filter(org.apache.spark.sql.functions.col("envelope").isNull)
      .select("value_out").collect()(0).getString(0)
    assert(bad == "not-json{{{")
  }
}
