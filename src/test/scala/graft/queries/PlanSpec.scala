package graft.queries

import graft.SparkSpec

/** Physical-plan regression guards: the scale properties argued in
  * README/SURVEY must stay visible in the executed plans — broadcast for
  * dims, TakeOrdered (never a global sort) for top-k, pruned scans.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("revenue top-k uses TakeOrderedAndProject, no global Sort") {
    val p = plan("q12_revenue_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("sort+limit compiles to TakeOrderedAndProject") {
    assert(plan("q07_sort_limit").contains("TakeOrderedAndProject"))
  }

  test("region rollup broadcasts both dimensions") {
    val p = plan("q13_region_rollup")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(500))
  }

  test("pricing summary scan prunes to the 5 needed lineitem columns") {
    val p = plan("q11_pricing_summary")
    val schema = "ReadSchema:.*".r.findFirstIn(p).getOrElse("")
    assert(schema.contains("l_quantity") && schema.contains("l_returnflag"))
    assert(!schema.contains("l_shipdate") && !schema.contains("l_partkey"),
      s"unexpected columns in $schema")
  }

  test("event classes joins labels via broadcast") {
    assert(plan("q03_event_classes").contains("BroadcastHashJoin"))
  }

  test("tiling is shuffle-free (no Exchange between scan and flatMap)") {
    val df = graft.SparkEntry.queries("q60_tiling_greedy")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // the only exchange allowed is the final orderBy's range partitioning
    val exchanges = "Exchange [a-z]+partitioning".r.findAllIn(p).toList
    assert(exchanges.forall(_.contains("rangepartitioning")), exchanges.toString)
  }
}
