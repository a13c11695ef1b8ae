package graft

import org.apache.spark.sql.types.{DateType, DecimalType}

/** Driver-contract guards: the invariants the correctness handshake
  * depends on, so a future query can't silently regress them.
  */
class EntryContractSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("every query's output schema is free of Decimal and Date columns") {
    // the driver's hash gate compares cell string reprs; Decimal carries
    // scale into its repr ('188.00' != DuckDB float '188.0') and Spark
    // DATE prints without the time DuckDB's datetime64 carries — the
    // presentation cast at the API boundary must eliminate both
    SparkEntry.queries.foreach { case (name, fn) =>
      val schema = fn(spark, sf).schema
      schema.fields.foreach { f =>
        assert(!f.dataType.isInstanceOf[DecimalType],
          s"$name.${f.name} leaks DecimalType through the API boundary")
        assert(f.dataType != DateType,
          s"$name.${f.name} leaks DateType through the API boundary")
      }
    }
  }

  test("every oracle key has a query and every oracle is dual-keyed by Verify") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    val missing = os -- qs
    assert(missing.isEmpty, s"oracles without queries: $missing")
    // every query carries an oracle — the HLL/GK sketches included,
    // via exact-recomputable columns + in-plan accuracy verdicts
    val rowsOnly = qs -- os
    assert(rowsOnly.isEmpty, s"queries without an oracle: $rowsOnly")
  }

  test("entry() smoke: flagship query returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
