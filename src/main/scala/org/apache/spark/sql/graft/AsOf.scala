package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}
import graft.plans.{AsOfJoinNode, AsOfJoinStrategy}

/** User-facing entry for the custom as-of join operator.
  *
  * Column arguments are plain names resolved against each side's analyzed
  * output, so there is no ambiguity when both sides share column names.
  */
object AsOf {

  /** Registers the planner strategy on the session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
    }
  }

  /** left AS-OF join right: latest right row per key with
    * rightTime strictly before leftTime, or nulls.
    */
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan0 = right.queryExecution.analyzed
    // self-join safety: if both sides descend from the same scan they share
    // exprIds, which mis-binds references in the exec — re-alias the right
    // side with fresh ids
    val rPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).isEmpty) rPlan0
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        rPlan0.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()), rPlan0)
    val caseSensitive =
      spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) = {
      val hits = p.output.filter(a =>
        if (caseSensitive) a.name == n else a.name.equalsIgnoreCase(n))
      hits match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"column '$n' not found in ${p.output.map(_.name).mkString(", ")}")
        case _ => throw new IllegalArgumentException(
          s"column '$n' is ambiguous (${hits.size} matches)")
      }
    }
    val (lk, rk) = (attr(lPlan, leftKey), attr(rPlan, rightKey))
    val (lt, rt) = (attr(lPlan, leftTime), attr(rPlan, rightTime))
    require(lk.dataType == rk.dataType,
      s"key types differ: ${lk.dataType.sql} vs ${rk.dataType.sql}")
    require(lt.dataType == rt.dataType,
      s"time types differ: ${lt.dataType.sql} vs ${rt.dataType.sql}")
    val node = AsOfJoinNode(lPlan, rPlan, lk, rk, lt, rt)
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], node)
  }
}
