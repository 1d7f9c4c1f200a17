package graft.plans

/** Scale-shape fingerprint of an executed physical plan: a census of the
  * operators that decide whether a query survives 100 TB — exchanges,
  * join strategies, sorts, windows, top-k, scans. Two plans with the same
  * fingerprint move data the same way; a lost broadcast (BroadcastHashJoin
  * → SortMergeJoin) or a new shuffle changes it. Deliberately blind to
  * everything that churns between runs (expression ids, codegen stage ids,
  * AQE coalescing, paths), so the committed golden fingerprints
  * (PlanQualitySpec) only move when the PLAN moves.
  */
object PlanFingerprint {

  /** Leading operator name of a plan-tree line: the first alphabetic token
    * after the tree-drawing prefix (`:  +- *(3) HashAggregate(...)` →
    * `HashAggregate`). */
  private def opOf(line: String): String = {
    val s = line.dropWhile(c => !c.isLetter)
    s.takeWhile(c => c.isLetter || c.isDigit)
  }

  def of(executedPlan: String): String = {
    // census the FINAL (post-AQE) plan only — the Initial Plan section
    // repeats every operator and churns with AQE decisions
    val lines = executedPlan.split("== Initial Plan ==").head.linesIterator.toSeq
    def countOp(ops: String*): Int = lines.count(l => ops.contains(opOf(l)))
    def countLine(sub: String): Int = lines.count(_.contains(sub))
    val counts = Seq(
      "ShuffleExchange" -> countOp("Exchange"),
      "BroadcastExchange" -> countOp("BroadcastExchange"),
      "ReusedExchange" -> countOp("ReusedExchange"),
      "BroadcastHashJoin" -> countOp("BroadcastHashJoin"),
      "SortMergeJoin" -> countOp("SortMergeJoin"),
      "ShuffledHashJoin" -> countOp("ShuffledHashJoin"),
      "BroadcastNestedLoopJoin" -> countOp("BroadcastNestedLoopJoin"),
      "CartesianProduct" -> countOp("CartesianProduct"),
      "Sort" -> countOp("Sort"),
      "SortAggregate" -> countOp("SortAggregate"),
      "Window" -> countOp("Window"),
      "WindowGroupLimit" -> countOp("WindowGroupLimit"),
      "TakeOrderedAndProject" -> countOp("TakeOrderedAndProject"),
      "TopKPerGroup" -> countOp("TopKPerGroup"),
      "ParquetScan" -> countLine("Scan parquet"))
    counts.filter(_._2 > 0).map { case (k, v) => s"$k=$v" }.mkString(" ")
  }
}
