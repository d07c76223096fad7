package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: per-query timing breakdown — construction (fn() returns a
  * DataFrame; iterative builds run collect/checkpoint jobs here) vs
  * execution (the count), plus job/stage counts per phase, repeated
  * warm. Usage: runMain graft.QProbe <sfDir> <name,name,...> [reps]
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",")
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.graft.failOnGlobalWindow", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size); ()
      }
    })
    // session warmup
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        jobs.set(0); stages.set(0)
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        Thread.sleep(50)
        val (jBuild, sBuild) = (jobs.get(), stages.get())
        jobs.set(0); stages.set(0)
        val n = df.count()
        val t2 = System.nanoTime()
        Thread.sleep(50)
        val (jExec, sExec) = (jobs.get(), stages.get())
        println(
          f"[qprobe] $name rep$i build=${(t1 - t0) / 1e9}%.3f s (jobs=$jBuild stages=$sBuild) " +
            f"exec=${(t2 - t1) / 1e9}%.3f s (jobs=$jExec stages=$sExec) rows=$n"
        )
      }
    }
    spark.stop()
  }
}
