package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.ExpectationsGate

/** s15's stream element (top-level: Spark encoders can't see inner-class
  * scope). */
case class GateEv(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

/** s15: per-micro-batch contract gate — clean batches publish, violating
  * batches quarantine whole with their audit, replays are no-ops.
  */
class ExpectationsGateSpec extends AnyFunSuite {
  import TestSpark._

  private def ev(id: Long, tpe: String, v: Double) =
    GateEv(id, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 7L, tpe, v)

  test("clean batches publish, a violating batch quarantines whole, replay is a no-op") {
    val root = Files.createTempDirectory("graft-gate").toString
    val (pub, quar) = (s"$root/published", s"$root/quarantine")
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[GateEv]
    val q = ExpectationsGate.gatedStream(spark, ms.toDF(), pub, quar, s"$root/ckpt")
    try {
      ms.addData(ev(1, "click", 5.0), ev(2, "view", 3.5))
      q.processAllAvailable()
      assert(new java.io.File(s"$pub/gen=0").exists())
      assert(!new java.io.File(quar).exists() ||
        !new java.io.File(quar).listFiles().exists(_.getName.startsWith("gen=")))
      // batch 1: one bad row (negative value) → the WHOLE batch quarantines
      ms.addData(ev(3, "click", 1.0), ev(4, "purchase", -2.0))
      q.processAllAvailable()
      assert(!new java.io.File(s"$pub/gen=1").exists())
      assert(new java.io.File(s"$quar/gen=1").exists())
      // published table holds exactly the clean batch's rows
      val published = spark.read.parquet(pub)
      assert(published.count() == 2)
      assert(published.filter(col("value") < 0).count() == 0)
      // quarantine preserves the bad batch byte-for-byte for replay
      val held = spark.read.parquet(quar)
      assert(held.count() == 2)
      assert(held.filter(col("value") < 0).count() == 1)
      // audits committed beside both destinations, batch-stamped
      val pubAudit = spark.read.parquet(s"$pub/_audit")
      assert(pubAudit.filter(!col("pass")).count() == 0)
      val quarAudit = spark.read.parquet(s"$quar/_audit")
      assert(quarAudit.filter(col("rule_id") === "value_nonneg" && !col("pass")).count() == 1)
      assert(quarAudit.filter(col("rule_id") === "type_domain" && !col("pass")).count() == 0)
      // replay of a committed batch id (different content) must be a no-op
      val replay = Seq(ev(99, "click", 1.0)).toDF()
      ExpectationsGate.gateBatch(spark, replay, 0L, pub, quar, ExpectationsGate.eventRules)
      assert(spark.read.parquet(pub).count() == 2)
    } finally q.stop()
  }
}
