package graft

import org.apache.spark.sql.functions._

/** Round-11 additions: the IVF-PQ residual index and the SCC closure-loop
  * trim, each pinned by the law that justified it. */
class Round11Spec extends SparkTestBase {

  test("graph_scc: distributed path-doubling equals the single-task closure") {
    // the r11 loop drops the textbook R ∪ R∘R union (self-pairs make
    // composition reflexive, so R ⊆ R∘R) — this parity test is what makes
    // that a provable rewrite, not a hope: cap=0 forces the distributed
    // loop, cap=MaxValue the one-task BFS kernel, and the unique-fixpoint
    // property says any sound closure gives identical SCCs
    val fast = operators.Graphs.sccImpl(spark, sfDir, Long.MaxValue)
      .collect().map(_.toString)
    U.releaseTracked()
    val dist = operators.Graphs.sccImpl(spark, sfDir, 0L)
      .collect().map(_.toString)
    U.releaseTracked()
    assert(fast.nonEmpty && fast.sameElements(dist),
      s"scc gate parity broke: single-task ${fast.length} rows vs " +
        s"distributed ${dist.length}")
  }

  test("sim_ivfpq_recall beats the sim_ivf_curve nprobe=1 row (the r10 ask)") {
    // the residual configuration must stay ABOVE the cheapest IVF setting
    // it competes with — the measured reason this index exists; raw PQ
    // (sim_pq_recall) scores ~0.2 here and is refused by its own gate
    val ivfpq = SparkEntry.queries("sim_ivfpq_recall")(spark, sfDir)
      .agg(avg(col("recall"))).collect().head.getDouble(0)
    U.releaseTracked()
    val curve = SparkEntry.queries("sim_ivf_curve")(spark, sfDir)
      .filter(col("nprobe") === 1L)
      .collect().head.getAs[Double]("recall")
    U.releaseTracked()
    assert(ivfpq >= curve,
      s"IVF-PQ mean recall $ivfpq fell below the nprobe=1 IVF row $curve")
    val pq = SparkEntry.queries("sim_pq_recall")(spark, sfDir)
      .agg(avg(col("recall"))).collect().head.getDouble(0)
    U.releaseTracked()
    assert(ivfpq > pq,
      s"the residual index ($ivfpq) must beat the raw PQ codes ($pq)")
  }

  test("sim_ivfpq_adc ranks are exact-L2-coherent and per-query complete") {
    val rows = SparkEntry.queries("sim_ivfpq_adc")(spark, sfDir).collect()
    U.releaseTracked()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == (0L until 10L).toSet, "every query answers")
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
      // refined distances are exact L2 — must be non-decreasing in rank
      assert(sorted.map(_.getAs[Long]("d2")).toSeq ==
        sorted.map(_.getAs[Long]("d2")).sorted.toSeq,
        s"query $q: refined d2 not monotone in rank")
      assert(sorted.forall(_.getAs[Long]("vec_id") != q),
        s"query $q returned itself")
    }
  }
}
