package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plans of representative queries so the
  * shuffle/broadcast/pushdown shape can be audited against SCALING.md.
  * `sbt "runMain graft.tools.PlanAudit [sfDir]"`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]").appName("plan-audit")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val interesting = Seq(
      "q_filter_project",      // expect PushedFilters + pruned ReadSchema
      "q_join_orders_customer",// expect BroadcastHashJoin, no fact shuffle
      "q_traj_distances",      // expect ReusedExchange for the 2nd role
      "q_sim_topk",            // expect broadcast query side, no explode
      "q_traj_closest_contact",// expect TakeOrderedAndProject
      "q_dedup_ngram_df",      // expect broadcast anti-joins (hot sets),
                               // no cross join, barriered rebuilds
      "q_decontaminate_df",    // expect broadcast hot anti-join +
                               // broadcast bench joins
      "q_dedup_pipeline")      // composed post-cluster consumer: no
                               // cartesian, one cluster-size window,
                               // span kernel over survivors
    interesting.foreach { name =>
      println(s"\n=============== $name ===============")
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
