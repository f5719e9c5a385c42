package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.debug._

object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q12_token_count")(spark, "/root/testdata/sf0.001")
    df.count()
    val code = df.queryExecution.debug.codegenToSeq().map(_._2).mkString("\n")
    println("[codegen] contains tokenCount call: " + code.contains("graft.functions.StringKernels.tokenCount"))
    println(df.queryExecution.executedPlan.toString.linesIterator.take(8).mkString("\n"))
    spark.stop()
  }
}
