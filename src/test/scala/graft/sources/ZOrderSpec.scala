package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout quality: the bit-interleave itself, and the file-skipping
  * claim — on a uniform 2-D grid written z-clustered, a box filter on
  * EITHER dimension touches a small fraction of files, while a
  * single-column sort gives perfect pruning on one dimension and none on
  * the other. "Files touched" = files containing at least one matching row,
  * i.e. the floor any min/max-stats pruner must read. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (a=5, b=3, 3 bits -> 27)") {
    val got = Seq((5, 3)).toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b"), 3).as("z"))
      .as[Long].head()
    // a=101, b=011: positions (a0,b0,a1,b1,a2,b2) = 1,1,0,1,1,0 -> 27
    assert(got === 27L)
  }

  test("zValue is monotone on each axis within a fixed other-axis value") {
    val rows = Seq((0, 7), (1, 7), (2, 7), (3, 7)).toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b"), 3).as("z")).as[Long].collect()
    assert(rows.toSeq === rows.sorted.toSeq)
  }

  test("z-clustered layout prunes on BOTH dimensions; x-sorted layout fails on y") {
    val n = 64 // 64x64 grid
    val grid = spark.range(0, n.toLong * n)
      .select((col("id") % n).cast("int").as("x"), (col("id") / n).cast("int").as("y"))
    val nFiles = 16
    val zPath = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    val xPath = java.nio.file.Files.createTempDirectory("xsort").toString + "/t"
    ZOrder.writeClustered(grid, zPath, col("x"), col("y"), bits = 6, nFiles = nFiles)
    grid.repartitionByRange(nFiles, col("x")).sortWithinPartitions("x")
      .write.parquet(xPath)

    def filesTouched(path: String, pred: org.apache.spark.sql.Column): Long =
      spark.read.parquet(path).filter(pred)
        .select(input_file_name()).distinct().count()

    val xq = col("x") < n / 4 // quarter-range box on x
    val yq = col("y") < n / 4 // quarter-range box on y

    val (zx, zy) = (filesTouched(zPath, xq), filesTouched(zPath, yq))
    val (sx, sy) = (filesTouched(xPath, xq), filesTouched(xPath, yq))

    // x-sorted: perfect on x (~1/4 of files), useless on y (all files)
    assert(sx <= nFiles / 2, s"x-sorted should prune x queries, touched $sx")
    assert(sy == nFiles, s"x-sorted layout cannot prune y queries, touched $sy")
    // z-ordered: both dimensions prune — strictly better worst case
    assert(zx < nFiles && zy < nFiles, s"z-order must prune both dims: zx=$zx zy=$zy")
    assert(math.max(zx, zy) < math.max(sx, sy),
      s"z-order worst-dimension pruning (max($zx,$zy)) must beat single-sort (max($sx,$sy))")
    // and the quarter-box should touch at most ~half the files on either dim
    assert(zx <= nFiles / 2 && zy <= nFiles / 2, s"weak pruning: zx=$zx zy=$zy")
  }
}
