package graft
import org.apache.spark.sql.execution.ExplainMode
/** Per-op formatted-plan dump (r17): writes `## <op>` sections for the
  * named registry ops to the given directory, one `<op><suffix>.txt`
  * each — the before/after plan evidence the optimization rounds
  * commit under plans/rN/. Same explainFull + print-budget conventions
  * as [[PlanDump]]. Usage:
  *   sbt "runMain graft.PlanOne <outDir> <suffix> op1,op2,..."
  */
object PlanOne {
  def main(args: Array[String]): Unit = {
    val (outDir, suffix, names) = (args(0), args(1), args(2).split(",").toSeq)
    // optional 4th arg "exec": dump the plan AS EXECUTED (memoized
    // subtrees appear as their materialized Scan ExistingRDD roots) —
    // the evidence shape for single-materialization claims, where the
    // full tree would just re-print the identical derivation twice.
    val asExec = args.length > 3 && args(3) == "exec"
    val spark = GraftSession.local()
    val dir = "/root/testdata/sf0.001"
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      spark.conf.set("spark.graft.explainFull", (!asExec).toString)
      var plan = Registry.queries(n)(spark, dir)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      var note = ""
      if (plan.length > 500000) {
        spark.conf.set("spark.graft.explainFull", "false")
        plan = Registry.queries(n)(spark, dir)
          .queryExecution.explainString(ExplainMode.fromString("formatted"))
        note = "_Full tree exceeds the dump budget (unrolled rounds " +
          "multiply in print, not in execution); shown as executed._\n\n"
      }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$n$suffix.txt"),
        s"## $n\n\n$note```\n$plan```\n")
      println(s"[planone] wrote $outDir/$n$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
