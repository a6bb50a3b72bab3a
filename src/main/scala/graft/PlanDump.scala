package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for the named queries (or all) to one
  * file per query — the optimization rounds' plan evidence
  * (plans/rNN/<query>_{before,after}.txt). Same session config as
  * Bench so the captured plan is the benched plan.
  *
  * Usage: runMain graft.PlanDump <outDir> [suffix] [q_a,q_b,...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: runMain graft.PlanDump <outDir> [suffix] [q_a,q_b,...]")
      sys.exit(2)
    }
    val outDir = args(0)
    val suffix = if (args.length > 1) args(1) else "plan"
    val names = if (args.length > 2)
      args(2).split(',').map(_.trim).filter(_.nonEmpty).toSeq
    else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    // "exec" as a 4th arg: run the query (collect) and dump the FINAL
    // adaptive plan instead of the initial one — this is where
    // ReusedExchange / AQE join rewrites are visible.
    val execMode = args.length > 3 && args(3) == "exec"
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        if (execMode) df.collect()
        val plan = if (execMode) df.queryExecution.executedPlan.toString
          else df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
        println(s"[plandump] $name -> $outDir/${name}_$suffix.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
