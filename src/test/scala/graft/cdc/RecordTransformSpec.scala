package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The user-extension surface: custom transforms compose with the built-in
  * enrichment and run through the same pipeline (SURVEY.md §2.10 parity
  * with the reference's Pulsar Function interface).
  */
class RecordTransformSpec extends SparkSpec {

  test("custom transform composes with enrich via |>") {
    import spark.implicits._
    val redact = RecordTransform("redact-email") { df =>
      df.withColumn("value_out",
        regexp_replace(col("value_out"), "\"email\":\"[^\"]*\"", "\"email\":\"<redacted>\""))
    }
    val pipeline = RecordTransform.enrich(
      EnrichConfig(processingTimeIso = Some("t"))) |> redact
    assert(pipeline.name == "cdc-enrichment |> redact-email")

    val in = Seq(
      """{"op":"c","ts_ms":5,"after":{"id":1,"email":"sec@x.io"}}""").toDF("value")
    val out = pipeline(in).select("value_out").collect()(0).getString(0)
    assert(out.contains("\"email\":\"<redacted>\""))
    assert(!out.contains("sec@x.io"))
    assert(out.contains("\"enrichment\"")) // enrich ran first
  }
}
