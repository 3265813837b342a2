package graft
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.scalatest.funsuite.AnyFunSuite
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  test("repetition filter plan is a narrow projection (no aggregate, " +
    "single exchange only for the presentation sort)") {
    val df = text.TextQueries.repetitionFilter(spark, SparkTestBase.sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate"))
    assert(!plan.contains("Generate")) // no token explode
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected only the sort exchange, got:\n$plan")
  }

  /** The frame axis is the one that grows without bound at 100 TB, so
    * no query may FORCE a broadcast of a relation that carries a frame
    * column (the r3 unitcell and r4 pair-role hazards, now a standing
    * rule). With autoBroadcastJoinThreshold=-1 every surviving
    * BroadcastExchange in the static plan stems from an explicit hint
    * (stats-gated planner broadcasts are disabled, and inner cross
    * joins fall back to CartesianProduct), so collecting frame-carrying
    * BroadcastExchange nodes detects exactly the forced ones. AQE may
    * still choose a runtime broadcast from observed sizes — that is a
    * sized decision, not a forced one, and is out of scope here. */
  test("no query force-broadcasts a relation carrying a frame column") {
    // NAME-BASED guard: frame columns must be called frame_id, frame,
    // or *_frame for this rule to see them — any new query that aliases
    // the frame axis to another name (fid, f, ...) evades the check, so
    // new frame-column aliases MUST follow the *_frame convention.
    def carriesFrame(name: String): Boolean =
      name == "frame_id" || name == "frame" || name == "u_frame" ||
        name.endsWith("_frame")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
        val df = fn(spark, SparkTestBase.sf)
        val offenders = df.queryExecution.sparkPlan.collect {
          case b: BroadcastExchangeExec
              if b.output.exists(a => carriesFrame(a.name)) => b
        }
        assert(offenders.isEmpty,
          s"$name force-broadcasts a frame-axis relation:\n" +
            offenders.map(_.treeString).mkString("\n"))
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
