package org.apache.spark.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptions, JacksonParser}
import org.apache.spark.sql.catalyst.util.{FailureSafeParser, PermissiveMode}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** Bridge into the `private[sql]` Jackson parsing stack
  * (`JacksonParser`/`JSONOptions`/`FailureSafeParser`) so graft's
  * DataSource V2 CDC source (`graft.sources`) parses envelope lines with
  * the EXACT machinery `from_json`/the built-in json source use — same
  * PERMISSIVE semantics, same type coercions — instead of a hand-rolled
  * JSON-to-InternalRow converter that would drift from Spark's. Like
  * [[GraftSqlBridge]], nothing else from the private surface is touched.
  */
object GraftSqlJsonBridge {

  /** A `line => rows` JSON parser with PERMISSIVE semantics: a malformed
    * line yields one all-null row (never throws), exactly like
    * `from_json`. NOT thread-safe — build one per reader/partition.
    *
    * @param schema     struct to materialize (may be a nested-pruned subset
    *                   of the full envelope — only these fields are built)
    * @param timeZoneId session time zone, for temporal-type parsing
    * @param filters    row-skip predicates applied DURING parsing
    *                   (JacksonParser's native filter support): a
    *                   well-formed line failing them returns an EMPTY
    *                   iterator — cheaper than materializing the row. A
    *                   malformed line still yields the one all-null
    *                   PERMISSIVE row (filters never see it).
    */
  def permissiveLineParser(
      schema: StructType, timeZoneId: String,
      filters: Seq[org.apache.spark.sql.sources.Filter] = Nil)
      : UTF8String => Iterator[InternalRow] = {
    if (schema.isEmpty) {
      // count(*)-style scans: no fields to parse, one empty row per line
      val row = new GenericInternalRow(0)
      (_: UTF8String) => Iterator.single(row)
    } else {
      // corrupt-record column name deliberately absent from `schema`:
      // PERMISSIVE then nulls every field of a bad record, which is the
      // envelope contract (raw value passes through, typed view is null).
      // allowArrayAsStructs = false ON PURPOSE: the parity baseline is
      // CdcEnvelope.parse, which gates from_json on a root-is-object
      // check — an array root there is a null envelope, so the V2 scan
      // must null it too (spec-pinned). Input is UTF8String, not java
      // String: raw line bytes never round-trip through a JVM String,
      // so invalid UTF-8 flows exactly as the built-in json reader
      // treats it (byte-faithful parity).
      val opts = new JSONOptions(
        Map.empty[String, String], timeZoneId, "_graft_corrupt_record")
      val parser =
        new JacksonParser(schema, opts, allowArrayAsStructs = false, filters)
      val safe = new FailureSafeParser[UTF8String](
        (s: UTF8String) => parser.parse(s, CreateJacksonParser.utf8String,
          (u: UTF8String) => u),
        PermissiveMode, schema, "_graft_corrupt_record")
      (s: UTF8String) => safe.parse(s)
    }
  }
}
