package graft

import org.apache.spark.sql.SparkSession

/** Single-query timing harness: `runMain graft.QueryBench <queryName> [reps]`.
  * Mirrors Bench's session config and noop-write forcing, but runs one
  * declared query so a cold-JVM cost can be attributed to one plan. Prints
  * `@@ <name> rep<i> <sec>` lines (grep-able past sbt/REPL decoration).
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 1
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("SPARK_GRAFT_STAGES")) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val dur = for (s <- si.submissionTime; c <- si.completionTime) yield (c - s) / 1e3
          println(f"@@ stage ${si.stageId}%3d ${dur.getOrElse(-1.0)}%8.2fs tasks=${si.numTasks}%4d ${si.name.take(80)}")
        }
      })
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"@@ $name rep$i ${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
