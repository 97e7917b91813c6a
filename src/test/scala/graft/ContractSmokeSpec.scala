package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executes every declared contract query end-to-end at sf0.001.
  *
  * PlanSpec's cartesian guard already ANALYZES all plans, but an execution-
  * only failure (codegen exception, a cast that dies on real data, a
  * streaming harness break) still reaches the driver's per-round gate
  * undetected — the round-8 outage pattern: a green unit suite while the
  * product could not run its own contract surface. This suite is the local
  * pre-commit version of the driver's Verify run. Row counts are not
  * asserted (tiny-SF results can legitimately be empty); successful
  * execution is the contract.
  */
class ContractSmokeSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("oracleSql covers exactly the declared query surface") {
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet)
  }

  test("flagship entry() runs and returns rows") {
    assert(SparkEntry.entry(spark).collect().nonEmpty)
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$name executes end-to-end at sf0.001") {
      val rows = SparkEntry.queries(name)(spark, sfDir).collect()
      assert(rows != null)
      graft.ops.OpCaches.unpersistAll()
    }
  }
}
