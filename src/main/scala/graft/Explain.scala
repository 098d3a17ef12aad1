package graft

/** Plan audit main: prints the formatted physical plan of selected
  * queries so pushdown/broadcast/codegen can be reviewed (SURVEY.md §5).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.create(8)
    val names = if (args.nonEmpty) args.toSeq else Seq("q_filtered_read", "q1_agg", "q3_top_orders", "q5_join5")
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
