package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal.PgmCodec

/** The graft-frames DataSource V2 connector: container files as tables,
  * column pruning into the decoder, corrupt-file quarantine rows.
  */
class FrameSourceSpec extends AnyFunSuite {
  import TestSpark._

  /** Write n container files, file i holding (2 + i) frames of side 8+i. */
  private def writeContainers(n: Int): (String, Seq[Int]) = {
    val dir = Files.createTempDirectory("graft-frames").toString
    val counts = (0 until n).map { i =>
      val side = 8 + i
      val frames = (0 to 1 + i).map { f =>
        val px = Array.tabulate(side * side)(j => ((j + 31 * f) % 256).toByte)
        PgmCodec.encode(side, side, px)
      }
      Files.write(Paths.get(s"$dir/c$i.pgmc"), frames.flatten.toArray)
      frames.length
    }
    (dir, counts)
  }

  test("reads one row per frame across container files with decoded metadata") {
    val (dir, counts) = writeContainers(3)
    val df = spark.read.format("graft-frames").load(dir)
    assert(df.schema.fieldNames.toSeq ==
      Seq("path", "frame_idx", "decode_ok", "width", "height", "mean_pixel", "ahash"))
    val rows = df.collect()
    assert(rows.length == counts.sum)
    assert(rows.forall(_.getAs[Boolean]("decode_ok")))
    // per-file frame counts and frame indexes are sequential from 0
    val byFile = rows.groupBy(_.getAs[String]("path"))
    assert(byFile.size == 3)
    byFile.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("frame_idx")).sorted.toSeq == rs.indices.toSeq)
    }
    // decoded dims match the synthesis (file i → side 8+i)
    rows.foreach { r =>
      val i = r.getAs[String]("path").split("/c").last.stripSuffix(".pgmc").toInt
      assert(r.getAs[Int]("width") == 8 + i && r.getAs[Int]("height") == 8 + i)
    }
    // features agree with computing them directly from the codec
    val c0 = Files.readAllBytes(Paths.get(s"$dir/c0.pgmc"))
    val img0 = PgmCodec.decodeFrom(c0, 0).get._1
    val r0 = rows.filter(r => r.getAs[String]("path").endsWith("c0.pgmc") &&
      r.getAs[Int]("frame_idx") == 0).head
    assert(r0.getAs[Long]("ahash") == PgmCodec.aHash(img0))
    val mean0 = img0.pixels.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / img0.pixels.length
    assert(math.abs(r0.getAs[Double]("mean_pixel") - mean0) < 1e-3)
  }

  test("column pruning reaches the scan: unselected feature columns leave the plan") {
    val (dir, _) = writeContainers(2)
    val slim = spark.read.format("graft-frames").load(dir)
      .select("path", "frame_idx")
    val plan = slim.queryExecution.executedPlan.toString
    // the scan's ReadSchema reflects the pruned columns — the decoder
    // skips mean/aHash work entirely for this query
    assert(plan.contains("graft-frames"), plan)
    assert(!plan.contains("mean_pixel"), plan)
    assert(slim.count() > 0)
    // aggregate pushable shape: counting frames reads no feature columns
    val n = spark.read.format("graft-frames").load(dir)
      .groupBy("path").agg(count(lit(1))).count()
    assert(n == 2)
  }

  test("a corrupt container yields one quarantine row, not a failed scan") {
    val (dir, counts) = writeContainers(1)
    // truncate the single container mid-frame
    val p = Paths.get(s"$dir/c0.pgmc")
    val full = Files.readAllBytes(p)
    Files.write(p, java.util.Arrays.copyOf(full, full.length - 7))
    val rows = spark.read.format("graft-frames").load(dir).collect()
    // leading intact frames decode; the torn tail is one decode_ok=false row
    assert(rows.count(!_.getAs[Boolean]("decode_ok")) == 1)
    assert(rows.length <= counts.head)
    val bad = rows.filter(!_.getAs[Boolean]("decode_ok")).head
    assert(bad.isNullAt(bad.fieldIndex("width")) && bad.isNullAt(bad.fieldIndex("ahash")))
  }

  test("path filter pushdown plans only the matching container files") {
    val (dir, counts) = writeContainers(3)
    val one = spark.read.format("graft-frames").load(dir)
      .filter(col("path") === s"file:$dir/c1.pgmc")
    // file pruning at PLANNING time: exactly one input partition survives
    assert(one.rdd.getNumPartitions == 1, s"got ${one.rdd.getNumPartitions} partitions")
    assert(one.count() == counts(1))
    // prefix filter (the directory-subset shape)
    val pre = spark.read.format("graft-frames").load(dir)
      .filter(col("path").startsWith(s"file:$dir/c2"))
    assert(pre.rdd.getNumPartitions == 1 && pre.count() == counts(2))
    // pushdown never changes results: unfiltered equals filter-union
    val all = spark.read.format("graft-frames").load(dir).count()
    assert(all == counts.sum)
  }

  test("frame_idx bound stops the container walk before later frames decode") {
    val (dir, _) = writeContainers(1) // c0 has 2 frames
    // corrupt the SECOND frame: an unfiltered scan must quarantine, but a
    // frame_idx < 1 scan stops before ever decoding it — proof the bound
    // skips decode work rather than filtering rows afterwards
    val p = Paths.get(s"$dir/c0.pgmc")
    val full = Files.readAllBytes(p)
    Files.write(p, java.util.Arrays.copyOf(full, full.length - 7))
    val unfiltered = spark.read.format("graft-frames").load(dir).collect()
    assert(unfiltered.count(!_.getAs[Boolean]("decode_ok")) == 1)
    val bounded = spark.read.format("graft-frames").load(dir)
      .filter(col("frame_idx") < 1).collect()
    assert(bounded.length == 1 && bounded.head.getAs[Boolean]("decode_ok"),
      "the torn second frame must never be reached under the pushed bound")
    assert(bounded.head.getAs[Int]("frame_idx") == 0)
  }

  test("SQL path works through the registered short name") {
    val (dir, counts) = writeContainers(2)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW frames_v USING `graft-frames` OPTIONS (path '$dir')")
    val n = spark.sql("SELECT count(*) FROM frames_v").head().getLong(0)
    assert(n == counts.sum)
  }
}
