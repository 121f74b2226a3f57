package graft

import org.apache.spark.sql.functions._

/** Throwaway profiling main — NOT part of the library; deleted before commit. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val centers = graft.operators.Similarity.kmeansCentroids(spark, dir, 16, 3)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    import graft.operators.Similarity
    val m = Similarity.getClass.getDeclaredMethods.find(_.getName == "nearestCell").get
    m.setAccessible(true)
    def nearest = m.invoke(Similarity, col("ne"), centers).asInstanceOf[org.apache.spark.sql.Column]
    time("assign run 1") { emb.withColumn("cell", nearest).write.format("noop").mode("overwrite").save() }
    time("assign run 2") { emb.withColumn("cell", nearest).write.format("noop").mode("overwrite").save() }
    time("assign run 3") { emb.withColumn("cell", nearest).write.format("noop").mode("overwrite").save() }
    // count rows to show data volume
    println("[scratch] rows=" + emb.count())
    spark.stop()
  }
}
