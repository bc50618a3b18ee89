package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Plan-shape regression gate: the scale-killers caught in earlier
  * explain-audits must not be able to return silently. Asserts over
  * the compiled physical plan of EVERY registered query (sf0.001 —
  * plan shape, not data, is under test):
  *   - no CartesianProduct (a blocked pair join degrading to a cross
  *     join would pass correctness at test SF and die at 100 TB)
  *   - no unpartitioned Window (single-task sort of the whole input)
  *   - q1/q6 predicates reach the parquet scan (PushedFilters)
  */
class PlanAuditSpec extends SparkSpec {

  // sparkPlan = the statically-planned physical tree (executedPlan
  // wraps it in an AdaptiveSparkPlanExec with no children, which
  // would make node collection vacuously pass)
  private def physical(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sf).queryExecution.sparkPlan

  private def collectAll(p: SparkPlan): Seq[SparkPlan] =
    (p +: p.children.flatMap(collectAll)) ++ p.subqueries.flatMap(collectAll)

  test("no query plans a CartesianProduct") {
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val cart = collectAll(physical(name)).collect {
        case c: CartesianProductExec => c
      }
      assert(cart.isEmpty, s"$name plans a CartesianProduct")
    }
  }

  test("no query plans an unpartitioned Window over a non-constant input") {
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val bad = collectAll(physical(name)).collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty,
        s"$name plans a Window with no PARTITION BY — single-task sort")
    }
  }

  test("q1/q6 filters are pushed down to the parquet scan") {
    Seq("q1_pricing_summary", "q6_revenue_change").foreach { name =>
      val plan = physical(name).toString
      // scan strings get truncated, so just require a non-empty list
      // opener ("PushedFilters: [" followed by anything but "]")
      assert("PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined,
        s"$name: no non-empty PushedFilters in scan:\n$plan")
    }
  }

  test("dedup pair joins key on block/bucket columns, not bare label/lang") {
    // the candidate join's EQUI-JOIN KEYS themselves must include the
    // LSH/pigeonhole bucket — checking the whole plan string would
    // also match the distinct()'s HashAggregate(keys=...) and pass
    // even after a revert to a bare label join
    def joinKeyNames(name: String): Seq[Set[String]] =
      collectAll(physical(name)).collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec
            if j.leftKeys.nonEmpty =>
          j.leftKeys.flatMap(_.references.map(_.name)).toSet
      }
    Seq("dedup_embedding", "dedup_simhash").foreach { name =>
      val keys = joinKeyNames(name)
      assert(keys.exists(k => k.contains("key") && k.contains("tbl")),
        s"$name: no join keyed on (tbl, key) buckets — join keys were $keys")
    }
  }
}
