package graft.functions

import graft.{GraftExtensions, SparkSpec}
import org.apache.spark.sql.functions._

/** The SQL surface registered by [[graft.GraftExtensions]] must bind the
  * SAME expressions as the Scala DSL — verified by bit-equality between
  * `spark.sql` text and the DSL form over real corpus data.
  */
class ExtensionsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("SQL-registered functions match the DSL expressions bit-exactly") {
    GraftExtensions.registerAll(spark)
    graft.Tables.documents(spark, sf)
      .select(col("doc_id"), graft.text.TextOps.tokens(col("text")).as("toks"))
      .withColumn("hs", transform(col("toks"), t => graft.text.TextOps.hash56(t)))
      .createOrReplaceTempView("ext_docs")

    val viaSql = spark.sql(
      """SELECT doc_id,
        |  graft_simhash56(hs) AS sh,
        |  graft_shingle_hash56(toks) AS sh3,
        |  graft_shingle_hash56(toks, 2) AS sh2,
        |  graft_minhash_sig(transform(hs, h -> pmod(h, 2147483647L))) AS sig
        |FROM ext_docs""".stripMargin)
    val viaDsl = spark.table("ext_docs").select(
      col("doc_id"),
      VectorFunctions.simhash56(col("hs")).as("sh"),
      VectorFunctions.shingleHash56(col("toks")).as("sh3"),
      VectorFunctions.shingleHash56(col("toks"), 2).as("sh2"),
      VectorFunctions.minhashSig(
        transform(col("hs"), h => pmod(h, lit(graft.text.TextOps.P))),
        graft.text.TextOps.MinhashParams, graft.text.TextOps.P).as("sig"))
    assert(viaSql.exceptAll(viaDsl).isEmpty && viaDsl.exceptAll(viaSql).isEmpty)

    // graft_dot over the embeddings table
    graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .createOrReplaceTempView("ext_vecs")
    val dotSql = spark.sql(
      "SELECT vec_id, graft_dot(v, v) AS d FROM ext_vecs")
    val dotDsl = spark.table("ext_vecs")
      .select(col("vec_id"), VectorFunctions.dot(col("v"), col("v")).as("d"))
    assert(dotSql.exceptAll(dotDsl).isEmpty && dotDsl.exceptAll(dotSql).isEmpty)

    // the registration is also a valid session-build extension hook
    val hook: org.apache.spark.sql.SparkSessionExtensions => Unit =
      new GraftExtensions
    assert(hook != null)
  }
}
