package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, Cast, Coalesce, EqualTo, Expression, ExpressionInfo, If, Literal, Multiply, RegExpExtract}
import org.apache.spark.sql.types.LongType

import graft.expressions.{CosineSimilarity, MinHashSig}

/** SQL-surface registration of the engine's native expressions via
  * `SparkSessionExtensions` — install with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`:
  *
  *   - `graft_cosine(a, b)` — codegen'd cosine over float/double arrays
  *   - `graft_minhash_sig(shingle, numHashes)` — MinHash signature aggregate
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => new TopKPerGroupStrategy)
    ext.injectOptimizerRule(_ => FanOutExpensiveProjections)
  }
}

object GraftExtensions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))),
    (new FunctionIdentifier("graft_parse_duration"),
      new ExpressionInfo("graft.functions.Durations", "graft_parse_duration"),
      (children: Seq[Expression]) => {
        // catalyst-node equivalent of Durations.parseIso8601Duration (the
        // Column form can't be spliced into a function builder: its literal
        // wrappers stay unresolved)
        def comp(unit: String): Expression = {
          val ex = RegExpExtract(children(0), Literal("(\\d+)" + unit), Literal(1))
          Coalesce(Seq(
            If(EqualTo(ex, Literal("")), Literal(0L), Cast(ex, LongType)),
            Literal(0L)))
        }
        Add(Add(Multiply(comp("H"), Literal(3600L)),
          Multiply(comp("M"), Literal(60L))), comp("S"))
      }),
    (new FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash_sig"),
      (children: Seq[Expression]) => {
        val n = children(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_minhash_sig numHashes must be an integer literal, got $other")
        }
        MinHashSig(children(0), n)
      }))

  /** Register on an ALREADY-BUILT session (the `spark.sql.extensions` config
    * only applies at session construction). Idempotent. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
