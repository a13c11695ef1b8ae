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

    // graft_zorder: SQL name binds the same interleave; inputs with a bit
    // at position >= 8 make the explicit-bits path observable (x's bit 8
    // is dropped at bits=8, kept at the default 16), and INT literals
    // exercise the builder's cast-to-long
    val z = spark.sql(
      """SELECT graft_zorder(5, 3) AS z16,
        |  graft_zorder(256L, 1L, 8) AS z8,
        |  graft_zorder(256L, 1L) AS zWide""".stripMargin).head
    assert(z.getLong(0) == 27L) // 101⊗11 = 11011
    assert(z.getLong(1) == 2L, "bits=8 must drop x's bit 8")
    assert(z.getLong(2) == 65538L, "bits=16 must keep x's bit 8")

    // the real session-build path: a NEW session built with
    // .withExtensions must resolve the functions with no registerAll call
    // (shares the suite's SparkContext; sessions restored afterwards)
    import org.apache.spark.sql.SparkSession
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val viaExt = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(viaExt ne prev, "withExtensions must build a fresh session")
      val d = viaExt
        .sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .head.getDouble(0)
      assert(d == 11.0)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
