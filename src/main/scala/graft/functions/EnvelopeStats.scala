package graft.functions

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass structural analysis of a Debezium envelope JSON string.
  *
  * The enrichment semantics (reference `cdc_enrichment_function.py:23-107`)
  * need several *dynamic* facts a typed `from_json` struct cannot express:
  * whether the root is a JSON object at all (py's `json.loads` + dict access
  * contract), `before`/`after` JSON-null-ness (`is not None`, py:72-73), the
  * `after` object's key count (`len(after)`, py:76), whether the literal key
  * `email` exists (py:81), the email value and its JSON *type* (py:85 —
  * `"@" in email` raises TypeError for any non-string, which the outer
  * `except` turns into raw passthrough), and `source` dict truthiness
  * (py:59).
  *
  * Computing those with stock expressions costs one full JSON walk EACH
  * (`json_object_keys` ×3 + `get_json_object` ×3 — ~6 walks/row, measured
  * at ~1 ms/row). This expression extracts all of them in a single Jackson
  * streaming pass with no intermediate allocation, leaving exactly two
  * other walks in the pipeline: the typed `from_json` and the output
  * `to_json`.
  *
  * Null semantics mirror the stock-expression formulation it replaces:
  *   - `after_key_count`/`has_email_key`/`email_nonstring` are null when
  *     `after` is not a JSON object (like `json_object_keys` on a scalar);
  *   - `source_nonempty` is null when `source` is non-null and not an
  *     object, false for missing/null/`{}`, true otherwise;
  *   - trailing garbage after the root object marks the row invalid (py's
  *     `json.loads` raises on it).
  *
  * Exception-path facts (the reference's outer `except` turns each into
  * raw passthrough — see `Enrich.apply`):
  *   - `after_raises`: python raises before producing output — `after` is
  *     a number/bool (`len(after)` TypeError at py:76/78, including falsy
  *     0/false via the un-short-circuited `len(after) > 0`), or a
  *     non-empty string CONTAINING "email" / an array containing the
  *     string element "email" (the `in` test passes, then
  *     `after.get("email")` AttributeError at py:83);
  *   - `after_size`: python `len(after)` for the non-raising non-dict
  *     sizeables — string length in chars, array element count (dynamic
  *     `field_count` when after isn't an object); null otherwise;
  *   - `source_raises`: the `source` KEY is present with a non-dict value
  *     (including JSON null): `message.get("source", {})` returns it
  *     verbatim and the end-of-function log line
  *     `source.get('table', 'unknown')` (py:101) raises AttributeError
  *     even for falsy values the `if source:` gate skipped.
  */
case class EnvelopeStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = EnvelopeStats.schema
  override def prettyName: String = "graft_envelope_stats"

  override def nullSafeEval(in: Any): Any =
    EnvelopeStats.analyze(in.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.EnvelopeStats.analyze($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EnvelopeStats {

  val schema: StructType = StructType(Seq(
    StructField("is_object", BooleanType, nullable = false),
    StructField("has_before", BooleanType, nullable = false),
    StructField("has_after", BooleanType, nullable = false),
    StructField("after_key_count", IntegerType, nullable = true),
    StructField("has_email_key", BooleanType, nullable = true),
    StructField("email", StringType, nullable = true),
    StructField("email_nonstring", BooleanType, nullable = true),
    StructField("source_nonempty", BooleanType, nullable = true),
    StructField("after_size", IntegerType, nullable = true),
    StructField("after_raises", BooleanType, nullable = false),
    StructField("source_raises", BooleanType, nullable = false)
  ))

  // ALLOW_NON_NUMERIC_NUMBERS: Python's json.loads accepts the NaN /
  // Infinity / -Infinity constants by default (parse_constant), and
  // Spark's own from_json does too (allowNonNumericNumbers default
  // true) — Jackson's default would reject such envelopes here, flipping
  // them from enriched to raw passthrough against both references
  private val factory = {
    val f = new JsonFactory()
    f.enable(com.fasterxml.jackson.core.JsonParser.Feature.ALLOW_NON_NUMERIC_NUMBERS)
    f
  }

  private def fresh(): GenericInternalRow = {
    val r = new GenericInternalRow(11)
    r.update(0, false)  // is_object
    r.update(1, false)  // has_before
    r.update(2, false)  // has_after
    r.update(3, null)   // after_key_count
    r.update(4, null)   // has_email_key
    r.update(5, null)   // email
    r.update(6, null)   // email_nonstring
    r.update(7, false)  // source_nonempty (missing source == {} is falsy)
    r.update(8, null)   // after_size
    r.update(9, false)  // after_raises
    r.update(10, false) // source_raises
    r
  }

  /** Public: invoked from generated code. Never returns null for non-null
    * input — invalid JSON yields a row with `is_object = false`.
    */
  def analyze(s: UTF8String): InternalRow = {
    val row = fresh()
    try {
      val p = factory.createParser(s.getBytes)
      try {
        if (p.nextToken() != JsonToken.START_OBJECT) return fresh()
        while (p.nextToken() == JsonToken.FIELD_NAME) {
          val name = p.currentName()
          val vt = p.nextToken()
          name match {
            case "before" =>
              row.update(1, vt != JsonToken.VALUE_NULL)
              p.skipChildren()
            case "after" =>
              row.update(2, vt != JsonToken.VALUE_NULL)
              // re-assignment on duplicate keys: last occurrence wins,
              // like Python's dict
              row.update(3, null); row.update(4, null)
              row.update(5, null); row.update(6, null)
              row.update(8, null); row.update(9, false)
              if (vt == JsonToken.VALUE_NUMBER_INT ||
                  vt == JsonToken.VALUE_NUMBER_FLOAT ||
                  vt == JsonToken.VALUE_TRUE || vt == JsonToken.VALUE_FALSE) {
                // len(number/bool) raises TypeError — even for 0/false,
                // via is_complete's un-short-circuited len(after) > 0
                row.update(9, true)
              } else if (vt == JsonToken.VALUE_STRING) {
                val s0 = p.getText
                // code POINTS, not UTF-16 code units: Python's len()
                // counts an astral character once, String.length twice
                row.update(8, s0.codePointCount(0, s0.length))
                // "email" in "..." is a substring test; the subsequent
                // after.get("email") then raises AttributeError
                if (s0.contains("email")) row.update(9, true)
              } else if (vt == JsonToken.START_ARRAY) {
                var cnt = 0
                var hasEmailElem = false
                while (p.nextToken() != JsonToken.END_ARRAY) {
                  if (p.currentToken() == JsonToken.VALUE_STRING &&
                      p.getText == "email") hasEmailElem = true
                  p.skipChildren()
                  cnt += 1
                }
                row.update(8, cnt)
                // "email" in [...] is element membership; after.get then
                // raises AttributeError
                if (hasEmailElem) row.update(9, true)
              }
              if (vt == JsonToken.START_OBJECT) {
                // unique keys, like Python's len(json.loads(...)) — dup
                // keys collapse (and the email value takes the LAST
                // occurrence, like dict construction)
                val keys = new java.util.HashSet[String]()
                var hasEmail = false
                var email: UTF8String = null
                var nonString = false
                while (p.nextToken() == JsonToken.FIELD_NAME) {
                  val k = p.currentName()
                  val ft = p.nextToken()
                  keys.add(k)
                  if (k == "email") {
                    hasEmail = true
                    if (ft == JsonToken.VALUE_STRING) {
                      email = UTF8String.fromString(p.getText)
                      nonString = false
                    } else {
                      email = null
                      nonString = true
                    }
                  }
                  p.skipChildren()
                }
                row.update(3, keys.size)
                row.update(4, hasEmail)
                row.update(5, email)
                row.update(6, nonString)
              } else p.skipChildren()
            case "source" =>
              if (vt == JsonToken.START_OBJECT) {
                row.update(10, false) // dup keys: last occurrence wins
                var cnt = 0
                while (p.nextToken() == JsonToken.FIELD_NAME) {
                  p.nextToken()
                  p.skipChildren()
                  cnt += 1
                }
                row.update(7, cnt > 0)
              } else if (vt == JsonToken.VALUE_NULL) {
                row.update(7, false)
                row.update(10, true) // None.get('table') at the log line
              } else {
                row.update(7, null)
                row.update(10, true) // <scalar/array>.get AttributeError
                p.skipChildren()
              }
            case _ => p.skipChildren()
          }
        }
        if (p.currentToken() != JsonToken.END_OBJECT) return fresh()
        if (p.nextToken() != null) return fresh() // trailing garbage
        row.update(0, true)
        row
      } finally p.close()
    } catch {
      case _: Exception => fresh()
    }
  }

  def apply(c: Column): Column =
    GraftSqlBridge.column(EnvelopeStats(GraftSqlBridge.expression(c)))
}
