package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
import org.apache.spark.sql.execution.WholeStageCodegenExec

/** Dev-only: compile every WholeStageCodegen subtree of the named
  * queries' physical plans (no data execution) and report any janino
  * failure or oversized generated method — the reproduction half of the
  * round-19 codegen guard. */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")).getOrCreate()
    // static plans: AQE's wrapper hides the codegen stages until runtime
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val t0 = System.nanoTime()
      try {
        val qe = SparkEntry.queries(n)(spark, d).queryExecution
        val stages = qe.executedPlan.collectWithSubqueries {
          case w: WholeStageCodegenExec => w
        }
        var worst = 0
        var lines = 0
        stages.foreach { w =>
          val (_, code) = w.doCodeGen()
          val (_, stats) = CodeGenerator.compile(code)
          worst = math.max(worst, stats.maxMethodCodeSize)
          lines = math.max(lines, code.body.count(_ == '\n'))
        }
        val ms = (System.nanoTime() - t0) / 1000000
        println(f"OK   $n%-28s stages=${stages.size}%2d " +
          f"maxMethodBytes=$worst%6d maxLines=$lines%6d ${ms}ms")
      } catch {
        case e: Throwable =>
          println(s"FAIL $n: ${e.getClass.getSimpleName}: " +
            s"${String.valueOf(e.getMessage).linesIterator.take(3).mkString(" | ")}")
      }
    }
    spark.stop()
  }
}
