package graft

import org.apache.spark.sql.functions._

/** Source-format coverage: the engine's transforms are input-format
  * agnostic — CSV and JSON-lines copies of a table read back identical to
  * parquet and feed the same query plans (with schema supplied; header
  * inference exercised for CSV).
  */
class SourceFormatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("csv, json, and orc round-trip identical to parquet") {
    val nation = Tables.nation(spark, sf)
    val csvDir = tmpDir("fmt-csv")
    val jsonDir = tmpDir("fmt-json")
    val orcDir = tmpDir("fmt-orc")
    nation.write.mode("overwrite").option("header", "true").csv(csvDir)
    nation.write.mode("overwrite").json(jsonDir)
    nation.write.mode("overwrite").orc(orcDir)

    val fromCsv = spark.read.option("header", "true")
      .schema(nation.schema).csv(csvDir)
    val fromJson = spark.read.schema(nation.schema).json(jsonDir)
    val fromOrc = spark.read.orc(orcDir) // self-describing, no schema needed
    val expected = nation.collect().map(_.toSeq).toSet
    assert(fromCsv.collect().map(_.toSeq).toSet == expected)
    assert(fromJson.collect().map(_.toSeq).toSet == expected)
    assert(fromOrc.collect().map(_.toSeq).toSet == expected)
  }

  test("schema evolution: mergeSchema unions old and new parquet layouts") {
    // a corpus ingested over months gains columns; readers must keep
    // working over the mixed layout without rewriting history
    val dir = tmpDir("fmt-evolve")
    val v1 = Tables.nation(spark, sf)
    v1.write.mode("overwrite").parquet(dir + "/batch=1")
    val v2 = v1.withColumn("ingest_tag", lit("r2"))
    v2.write.mode("overwrite").parquet(dir + "/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.contains("ingest_tag"))
    assert(merged.count() == v1.count() * 2)
    // old rows surface the new column as null; new rows carry it
    assert(merged.filter(col("ingest_tag").isNull).count() == v1.count())
    assert(merged.filter(col("ingest_tag") === "r2").count() == v1.count())
    // queries over the shared columns are layout-agnostic
    val agg = merged.groupBy(col("n_regionkey")).count()
    assert(agg.collect().forall(_.getLong(1) % 2 == 0))
  }

  test("a join query runs unchanged over converted inputs") {
    val region = Tables.region(spark, sf)
    val nation = Tables.nation(spark, sf)
    val csvDir = tmpDir("fmt-q-csv")
    nation.write.mode("overwrite").option("header", "true").csv(csvDir)
    val nationCsv = spark.read.option("header", "true")
      .schema(nation.schema).csv(csvDir)
    def agg(n: org.apache.spark.sql.DataFrame) =
      n.join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name")).agg(count(lit(1)).as("n_nations"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg(nationCsv) == agg(nation) && agg(nation).nonEmpty)
  }
}
