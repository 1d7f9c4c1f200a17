package graft

/** Registry invariants: every judged query has a unique name, builds an
  * analyzable plan against the smoke fixtures, and its Spark output column
  * names exactly match what the driver's column-sorted compare needs (no
  * duplicates, no auto-generated names).
  */
class RegistrySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("query names are unique") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.length == names.length)
  }

  test("every query analyzes and exposes clean, unique column names") {
    Registry.all.foreach { q =>
      val df = q.fn(spark, sf)
      val cols = df.columns.toSeq
      assert(cols.distinct.length == cols.length, s"${q.name}: duplicate columns $cols")
      cols.foreach { c =>
        assert(c.matches("[A-Za-z_][A-Za-z0-9_]*"),
          s"${q.name}: auto-generated or unaliased column name '$c'")
      }
    }
  }

  test("judged outputs are scalar-only (driver compare cannot hash complex cells)") {
    import org.apache.spark.sql.types._
    Registry.all.filter(q => q.sql.isDefined).foreach { q =>
      q.fn(spark, sf).schema.fields.foreach { f =>
        val bad = f.dataType match {
          case _: ArrayType | _: MapType | _: StructType | _: BinaryType => true
          case _: DecimalType => true // degrades to float64 in the compare
          case _ => false
        }
        assert(!bad, s"${q.name}: column '${f.name}' has non-scalar judged type ${f.dataType}")
      }
    }
  }

  test("no judged query plans an all-pairs join (CartesianProduct or BNLJ)") {
    // j4 is an intentional (dims-only) cross join and rj joins a literal
    // band table, both deliberately broadcast-nested-loop; every other
    // judged plan must be a broadcast-hash or keyed join — an all-pairs
    // join over fact-sized inputs is the classic does-not-survive-100TB
    // plan, and BroadcastNestedLoopJoin is how Spark spells it for
    // inequality-only conditions
    // p13's BNLJ build side is a broadcast single-row global aggregate (the
    // scalar-subquery shape) — constant-size, not all-pairs
    val cartesianOk = Set("j4_cross_join")
    val bnljOk = Set("j4_cross_join", "rj_range_join", "p13_scalar_subquery")
    Registry.all.foreach { q =>
      val plan = q.fn(spark, sf).queryExecution.executedPlan.toString
      if (!cartesianOk(q.name))
        assert(!plan.contains("CartesianProduct"),
          s"${q.name} plans a CartesianProduct:\n$plan")
      if (!bnljOk(q.name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"${q.name} plans an all-pairs BroadcastNestedLoopJoin:\n$plan")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
