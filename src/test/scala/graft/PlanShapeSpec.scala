package graft
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
}
