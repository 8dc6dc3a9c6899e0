package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` of named queries to individual files —
  * the optimization-round evidence trail (`plans/r13/<q>_before.txt` /
  * `_after.txt`). Run:
  * `sbt "runMain graft.DumpPlanFiles <outDir> <suffix> q_a,q_b [sfDir]"`.
  * AQE disabled for readability, the [[DumpPlans]] convention (plan
  * SHAPE is what's being recorded; production re-plans at runtime on
  * top of these shapes).
  */
object DumpPlanFiles {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").toSeq
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.001"
    val spark = GraftSession.local("4", logLevel = "ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
