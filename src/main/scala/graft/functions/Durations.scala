package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ISO-8601 duration parsing, replicating the reference's semantics
  * (reference: /root/reference/app.py:110–126): `PT#H#M#S` where any absent
  * component counts as 0; day components are out of scope (the reference
  * never handles them either — SURVEY §2 row S7).
  *
  * Pure built-in composition (`regexp_extract` + arithmetic) so the whole
  * thing stays inside whole-stage codegen — no UDF, no custom Expression.
  */
object Durations {
  private def component(c: Column, unit: String): Column =
    // regexp_extract yields "" on no match; ANSI mode rejects ''→long casts,
    // so null it out first and default to 0
    coalesce(nullif(regexp_extract(c, "(\\d+)" + unit, 1), lit("")).cast("long"), lit(0L))

  /** `PT1H2M3S` → 3723L. Absent components → 0. Null input → 0 (the
    * reference's regex path would throw on None; we specify total behavior). */
  def parseIso8601Duration(c: Column): Column =
    component(c, "H") * 3600L + component(c, "M") * 60L + component(c, "S")
}
