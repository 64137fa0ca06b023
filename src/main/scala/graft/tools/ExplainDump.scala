package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dumps `.explain("formatted")` for a named subset of SparkEntry
  * queries to one file per query — the before/after plan evidence for
  * optimization rounds.
  *
  * `sbt "runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix> q1,q2"`
  * writes `<outDir>/<query>_<suffix>.txt` for each named query.
  *
  * Like [[PlanDump]], the query is EXECUTED first (toRdd.count) so the
  * dump appends the final adaptive plan (real join strategies, AQE
  * coalescing) after the formatted pre-execution view — explain alone
  * would show isFinalPlan=false placeholders for every AQE query.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, names) = args.take(4)
    val wanted = names.split(',').map(_.trim).filter(_.nonEmpty).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-explaindump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.contains(n) }
      .foreach { case (name, fn) =>
        try graft.operators.Dedup.withCandidateScope {
          spark.catalog.clearCache()
          val df = fn(spark, sfDir)
          val formatted = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          df.queryExecution.toRdd.count()
          val full = df.queryExecution.executedPlan.toString
          val finalPlan = full.indexOf("== Initial Plan ==") match {
            case -1 => full
            case i  => full.substring(0, i)
          }
          val text = (s"== explain(formatted) — $name at $sfDir ==\n\n" +
            formatted + "\n\n== Final adaptive plan (post-execution) ==\n\n" +
            finalPlan)
            .map(c => if (c >= ' ' || c == '\n' || c == '\t') c else '?')
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), text)
          println(s"[explaindump] wrote $outDir/${name}_$suffix.txt")
        } catch {
          case e: Throwable =>
            System.err.println(s"[explaindump] $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
