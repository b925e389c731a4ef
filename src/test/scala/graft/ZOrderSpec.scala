package graft

import graft.sources.{ZOrderReader, ZOrderWriter}
import org.apache.spark.sql.functions._

import java.nio.file.Files

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("interleaveBits: hand-computed Morton codes") {
    // x=0b11, y=0b01 -> z = y1 x1 y0 x0 = 0 1 1 1 = 7
    val df = Seq((3L, 1L)).toDF("x", "y")
      .select(ZOrderWriter.interleaveBits(Seq(col("x"), col("y")), 2).as("z"))
    assert(df.as[Long].head() == 7L)
    // 3 dims, 1 bit each: (1, 0, 1) -> 0b101 = 5
    val df3 = Seq((1L, 0L, 1L)).toDF("a", "b", "c")
      .select(ZOrderWriter.interleaveBits(Seq(col("a"), col("b"), col("c")), 1).as("z"))
    assert(df3.as[Long].head() == 5L)
  }

  test("bucketize clamps nulls and out-of-range to the edges") {
    val df = Seq(Some(0.0), Some(100.0), Some(-5.0), Some(200.0), None)
      .toDF("v")
      .select(ZOrderWriter.bucketize(col("v"), 0.0, 100.0, 4).as("b"))
    assert(df.as[Long].collect().toSeq == Seq(0L, 15L, 0L, 15L, 0L))
  }

  test("z-order layout prunes 2-D box queries; row-order layout cannot") {
    // deterministic 64x64 grid, input order shuffled with a seeded Random
    val rnd = new scala.util.Random(1234)
    val rows = rnd.shuffle((0 until 4096).toVector)
      .map(i => (i.toLong, (i % 64).toLong, (i / 64).toLong))
    val df = rows.toDF("id", "x", "y").repartition(4)

    val zDir = Files.createTempDirectory("zorder").toString
    val rowDir = Files.createTempDirectory("roworder").toString
    ZOrderWriter.write(df, Seq("x", "y"), zDir, numFiles = 16, bits = 6)
    df.repartition(16).write.mode("overwrite").parquet(rowDir)

    // per-file min/max for both dims == exactly the stats a reader prunes on
    def fileBoxes(dir: String): Seq[(Long, Long, Long, Long)] =
      new java.io.File(dir).listFiles.filter(_.getName.endsWith(".parquet"))
        .toSeq.map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(min("x"), max("x"), min("y"), max("y")).head()
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        }

    // box query x in [0,15], y in [0,15] — 1/16 of the space
    def intersecting(boxes: Seq[(Long, Long, Long, Long)]): Int =
      boxes.count { case (x0, x1, y0, y1) => x0 <= 15 && x1 >= 0 && y0 <= 15 && y1 >= 0 }

    val zBoxes = fileBoxes(zDir)
    val rowBoxes = fileBoxes(rowDir)
    assert(zBoxes.size == 16 && rowBoxes.size == 16)
    // a 1/16-area box falls in one Morton quadrant: few z-files intersect;
    // the shuffled row-order layout intersects on (nearly) every file
    assert(intersecting(zBoxes) <= 4,
      s"z-order should prune, got ${intersecting(zBoxes)}/16: $zBoxes")
    assert(intersecting(rowBoxes) >= 12,
      s"shuffled layout should not prune, got ${intersecting(rowBoxes)}/16")
    // and the data round-trips intact
    assert(spark.read.parquet(zDir).count() == 4096)
    assert(spark.read.parquet(zDir).agg(sum("id")).head().getLong(0)
      == (0L until 4096L).sum)
  }

  test("ZOrderReader reads <=4 of 16 files on a 1/16-area box, rows identical to full scan") {
    val rnd = new scala.util.Random(77)
    val rows = rnd.shuffle((0 until 4096).toVector)
      .map(i => (i.toLong, (i % 64).toLong, (i / 64).toLong))
    val df = rows.toDF("id", "x", "y").repartition(4)
    val zDir = Files.createTempDirectory("zread").toString
    ZOrderWriter.write(df, Seq("x", "y"), zDir, numFiles = 16, bits = 6)

    val box = Seq(("x", 0.0, 15.0), ("y", 0.0, 15.0))
    // the file list the reader will actually OPEN — this is the pruning
    // claim itself, not an intersection count over stats
    val files = ZOrderReader.prunedFiles(spark, zDir, box)
    assert(files.size <= 4, s"expected <=4 of 16 files read, got ${files.size}: $files")

    val pruned = ZOrderReader.readBox(spark, zDir, box)
      .select("id", "x", "y").as[(Long, Long, Long)].collect().sorted.toSeq
    val full = spark.read.parquet(zDir)
      .filter($"x".between(0, 15) && $"y".between(0, 15))
      .select("id", "x", "y").as[(Long, Long, Long)].collect().sorted.toSeq
    assert(pruned.size == 256) // the 16x16 box out of the 64x64 grid
    assert(pruned == full)

    // manifest is the plan path: it exists, is parquet, and lists 16 files
    val manifest = spark.read.parquet(s"$zDir/_graft_zorder_stats")
    assert(manifest.select("file").distinct().count() == 16)
    assert(manifest.columns.toSeq == Seq("file", "dim", "min", "max"))

    // footer fallback agrees with the manifest when the manifest is gone
    val fs = new java.io.File(s"$zDir/_graft_zorder_stats")
    def rmRf(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rmRf)); f.delete(); ()
    }
    rmRf(fs)
    val filesNoManifest = ZOrderReader.prunedFiles(spark, zDir, box)
    assert(filesNoManifest.toSet == files.toSet)

    // a box that misses the whole space reads zero files but keeps schema
    val empty = ZOrderReader.readBox(spark, zDir, Seq(("x", 1000.0, 2000.0)))
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("id", "x", "y"))
  }
}
