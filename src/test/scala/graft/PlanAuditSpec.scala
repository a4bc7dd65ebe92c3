package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}

/** Mechanized plan audits: the 100 TB posture claims in DESIGN.md as
  * executable assertions over the physical plans of the driver queries —
  * pushdown reaches the scan, projections prune columns, dimension sides
  * broadcast, top-k limits run below the exchange, and candidate-pruned
  * operators never degenerate into cross products.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan

  // pre-AQE plan: FileSourceScanExec nodes are directly collectible
  // (the adaptive wrapper hides them from collect on executedPlan)
  private def scans(name: String): Seq[FileSourceScanExec] =
    SparkEntry.queries(name)(spark, sf).queryExecution.sparkPlan
      .collectWithSubqueries { case f: FileSourceScanExec => f }

  test("q_scan_project: scan reads only the projected columns") {
    val s = scans("q_scan_project")
    assert(s.nonEmpty)
    s.foreach { f =>
      val cols = f.requiredSchema.fieldNames.toSet
      assert(!cols.contains("text"), s"projection not pruned: $cols")
    }
  }

  test("q_filter: predicate pushed to the parquet scan") {
    val s = scans("q_filter")
    assert(s.exists(_.metadata.getOrElse("PushedFilters", "")
      .contains("GreaterThan(l_quantity")),
      s.map(_.metadata.getOrElse("PushedFilters", "")).mkString(" | "))
  }

  test("q_sample_stratified: hash filter needs only id+stratum at the scan") {
    val s = scans("q_sample_stratified")
    assert(s.nonEmpty)
    s.foreach { f =>
      assert(f.requiredSchema.fieldNames.toSet == Set("doc_id", "source"),
        f.requiredSchema.fieldNames.mkString(","))
    }
  }

  test("q5_region_revenue: dimension sides broadcast, fact side streams") {
    val p = plan("q5_region_revenue").toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_vector_topk window form: rank limit runs below the exchange") {
    val p = plan("q_vector_topk").toString
    assert(p.contains("WindowGroupLimit"), "Spark 4 WindowGroupLimit missing")
  }

  test("q_vector_topk_agg: partial (map-side) aggregation before the shuffle") {
    val p = plan("q_vector_topk_agg").toString
    // ObjectHashAggregate appears twice: partial below the exchange,
    // final above — the <=k-rows-per-group-per-task shuffle contract
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("candidate-pruned operators never degenerate into cross products") {
    for (q <- Seq("q_dedup_embedding_lsh", "q_vector_ann", "q_vector_ivf",
        "q_minhash_pairs", "q_simhash_pairs", "q_decontaminate")) {
      val p = plan(q).toString
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a broadcast NLJ")
    }
  }

  test("q_decontaminate: benchmark gram set is the broadcast side") {
    assert(plan("q_decontaminate").toString.contains("BroadcastHashJoin"))
  }

  test("q_token_budget: one exchange per stratum window, no extra shuffles") {
    val p = plan("q_token_budget")
    val exchanges = p.collectWithSubqueries {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // scan-edge fan-out + window hash partitioning + final sort range
    assert(exchanges.size <= 3, s"${exchanges.size} shuffles: $p")
  }
}
