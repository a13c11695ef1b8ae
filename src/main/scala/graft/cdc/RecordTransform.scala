package graft.cdc

import org.apache.spark.sql.DataFrame

/** User-extensibility surface, the Spark-native equivalent of the
  * reference's Pulsar Function interface (subclass + `process(input, ctx)`,
  * reference `cdc_enrichment_function.py:10,19` — SURVEY.md §2.10): a named,
  * composable `DataFrame => DataFrame`. Implementations stay declarative
  * (build Columns, not row loops) so user transforms keep codegen and
  * pushdown — the engine's performance contract.
  */
trait RecordTransform extends (DataFrame => DataFrame) { self =>
  def name: String = getClass.getSimpleName
  /** Sequential composition, pipeline-style. */
  def |>(next: RecordTransform): RecordTransform = new RecordTransform {
    override def name: String = s"${self.name} |> ${next.name}"
    def apply(df: DataFrame): DataFrame = next(self(df))
  }
}

object RecordTransform {
  def apply(n: String)(f: DataFrame => DataFrame): RecordTransform =
    new RecordTransform {
      override def name: String = n
      def apply(df: DataFrame): DataFrame = f(df)
    }

  /** The reference's one built-in transform as a [[RecordTransform]]. */
  def enrich(cfg: EnrichConfig = EnrichConfig()): RecordTransform =
    apply("cdc-enrichment")(Enrich(_, cfg))
}
