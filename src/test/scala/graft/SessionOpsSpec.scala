package graft

import org.apache.spark.sql.functions._

/** Cross-operator invariants ("laws") for the round-5 additions — each test
  * ties one new operator to an independent ground truth (another operator,
  * an algebraic identity, or a bound), so a silent formula regression in
  * either the query or its oracle mirror cannot stay green. */
class SessionOpsSpec extends SparkTestBase {

  test("clustering-coefficient triangle counts sum to 3x graph_triangles") {
    val cc = graft.operators.Graphs.queries("graph_clustcoeff")(spark, sfDir)
    val triSum = cc.agg(sum(col("n_tri"))).head().getLong(0)
    val nTri = graft.operators.Graphs.queries("graph_triangles")(spark, sfDir)
      .head().getLong(0)
    assert(triSum == 3 * nTri,
      s"each triangle must appear at exactly 3 centers: $triSum vs 3*$nTri")
    val bad = cc.filter(col("clust_coeff") < 0 || col("clust_coeff") > 1).count()
    assert(bad == 0, "clustering coefficient must lie in [0,1]")
  }

  test("association-rule lift is symmetric and confidence bounded") {
    val r = graft.operators.Graphs.queries("graph_assoc_rules")(spark, sfDir)
    val overConf = r.filter(col("conf_micro") > 1000000L).count()
    assert(overConf == 0, "confidence cannot exceed 1")
    val asym = r.select(col("u"), col("v"), col("lift_micro"))
      .join(r.select(col("v").as("u"), col("u").as("v"),
        col("lift_micro").as("lift_rev")), Seq("u", "v"))
      .filter(col("lift_micro") =!= col("lift_rev")).count()
    assert(asym == 0, "lift(u,v) must equal lift(v,u) exactly")
  }

  test("boruvka output is an acyclic forest spanning every graph node") {
    val f = graft.operators.Graphs.queries("graph_mst")(spark, sfDir)
      .select(col("u"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(f.nonEmpty)
    assert(f.distinct.length == f.length, "forest edges must be unique")
    // acyclicity: union-find over the picked edges never closes a cycle
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      parent.getOrElseUpdate(x, x)
      if (parent(x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    }
    f.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      assert(ru != rv, s"edge ($u,$v) closes a cycle — not a forest")
      parent(ru) = rv
    }
    // spanning: every node of the support graph appears in the forest
    val cc = graft.operators.Graphs.queries("graph_clustcoeff")(spark, sfDir)
      .select(col("node")).collect().map(_.getLong(0)).toSet
    val covered = f.flatMap { case (u, v) => Seq(u, v) }.toSet
    assert(cc.subsetOf(covered),
      "every support-graph node picks an edge in round 1")
  }

  test("markov transition rows are complete probability distributions") {
    val m = graft.operators.TimeSeries.queries("ts_markov")(spark, sfDir)
    // within a row, counts sum to the row total and floored probabilities
    // stay within flooring slack of 1e6
    val rows = m.groupBy(col("from_type"))
      .agg(sum(col("n")).as("sn"), max(col("row_total")).as("rt"),
        sum(col("p_micro")).as("sp"), count(lit(1)).as("k"))
    assert(rows.filter(col("sn") =!= col("rt")).count() == 0)
    val bad = rows.filter(col("sp") > 1000000L ||
      col("sp") <= lit(1000000L) - col("k")).count()
    assert(bad == 0, "sum of floored probabilities must be in (1e6 - k, 1e6]")
  }

  test("DTW distance is zero against an exactly matching series") {
    // a synthetic frame whose 8 PAA segments equal the reference pattern
    // must produce distance 0; shifting one segment by delta costs <= delta
    // (one substitution step bound is delta; warping may do better)
    val q = graft.operators.TimeSeries.queries("ts_dtw")(spark, sfDir)
    val res = q.collect()
    assert(res.nonEmpty, "sf0.001 has users with >= 8 observed days")
    res.foreach { r =>
      val s = (1 to 8).map(i => r.getLong(r.fieldIndex(s"s$i")))
      val dtw = r.getLong(r.fieldIndex("dtw_dist"))
      assert(dtw >= 0, "DTW is a nonnegative cost")
      // DTW <= the no-warp (diagonal) Manhattan alignment cost
      val pat = graft.operators.TimeSeries.DtwPattern.toSeq
      val diag = s.zip(pat).map { case (a, b) => math.abs(a - b) }.sum
      assert(dtw <= diag, s"warping can only improve on diagonal: $dtw > $diag")
    }
  }

  test("changepoint split maximizes the statistic over a replayed scan") {
    val cp = graft.operators.TimeSeries.queries("ts_changepoint")(spark, sfDir)
      .select(col("user_id"), col("split_t"), col("stat")).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // recompute per-user stats naively from the raw events
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pts = U.events(spark, sfDir)
      .withColumn("vc", U.cents(col("value")))
      .withColumn("t", row_number().over(w).cast("long"))
      .withColumn("st", sum(col("vc")).over(w))
    val tot = pts.groupBy(col("user_id"))
      .agg(max(col("t")).as("n"), sum(col("vc")).as("sn"))
    val best = pts.join(tot, Seq("user_id")).filter(col("t") < col("n"))
      .withColumn("stat", abs(col("n") * col("st") - col("t") * col("sn")))
      .groupBy(col("user_id")).agg(max(col("stat")).as("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cp.nonEmpty && cp.keySet == best.keySet)
    cp.foreach { case (u, (_, stat)) =>
      assert(stat == best(u), s"user $u: reported stat $stat != max ${best(u)}")
    }
  }

  test("random projection preserves norms on average (J-L concentration)") {
    val rp = graft.llm.Similarity.queries("emb_rand_proj")(spark, sfDir)
    val meanRatio = rp.agg(avg(col("norm_ratio"))).head().getDouble(0)
    assert(meanRatio > 0.5 && meanRatio < 1.5,
      s"mean norm-distortion ratio should concentrate near 1: $meanRatio")
  }

  test("balanced sample yields identical per-label counts") {
    val sb = graft.llm.Pipeline.queries("sample_balanced")(spark, sfDir)
    val sizes = sb.groupBy(col("label")).agg(count(lit(1)).as("n"))
      .select(col("n")).distinct().collect()
    assert(sizes.length == 1, "every label must keep exactly k rows")
  }

  test("zipf fit slopes downward on natural-ish text") {
    val z = graft.llm.TextAnalysis.queries("text_zipf")(spark, sfDir).head()
    assert(z.getLong(z.fieldIndex("n_terms")) > 10)
    assert(z.getDouble(z.fieldIndex("zipf_slope")) < 0,
      "rank-frequency slope must be negative")
  }

  test("label propagation conserves the node set; assortativity is bounded") {
    val lp = graft.operators.Graphs.queries("graph_community_lp")(spark, sfDir)
    val total = lp.agg(sum(col("n_nodes"))).head().getLong(0)
    val nNodes = graft.operators.Graphs.queries("graph_clustcoeff")(spark, sfDir)
      .count() // clustcoeff rows = nodes with degree >= 2
    assert(total >= nNodes, s"every node keeps exactly one label: $total")
    val r = graft.operators.Graphs.queries("graph_assortativity")(spark, sfDir)
      .head().getDouble(1)
    assert(r >= -1.0 && r <= 1.0, s"correlation out of range: $r")
  }

  test("motif totals equal the per-user window count") {
    val m = graft.operators.TimeSeries.queries("ts_motif_count")(spark, sfDir)
    val totalMotifs = m.agg(sum(col("n"))).head().getLong(0)
    // each user with d days contributes max(d - 2, 0) windows
    val days = graft.operators.TimeSeries.queries("ts_sax")(spark, sfDir)
      .select(col("n_days")).collect().map(_.getLong(0))
    val expected = days.map(d => math.max(d - 2, 0L)).sum
    assert(totalMotifs == expected, s"$totalMotifs != $expected")
  }

  test("curation funnel budgets are consistent with soft weights") {
    val cur = graft.llm.Pipeline.queries("pipeline_curate")(spark, sfDir)
    cur.collect().foreach { r =>
      val raw = r.getLong(r.fieldIndex("raw_tokens"))
      val weighted = r.getLong(r.fieldIndex("weighted_tokens_micro"))
      assert(weighted <= raw * 1000000L,
        "weights cannot exceed 1.0: weighted budget above raw budget")
      assert(weighted > 0, "kept sources must retain some weighted mass")
    }
  }

  test("cross-modal screen scores only text-near-dup pairs, cos in range") {
    val x = graft.llm.Similarity.queries("dedup_text_vs_embedding")(spark, sfDir)
    x.collect().foreach { r =>
      assert(r.getDouble(r.fieldIndex("jac")) >= 0.2)
      val c = r.getDouble(r.fieldIndex("cos"))
      assert(c >= -1.0001 && c <= 1.0001, s"cosine out of range: $c")
    }
  }

  test("welch t is antisymmetric in the pair orientation") {
    // recompute with the pair order flipped by negating the statistic:
    // |t(a,b)| must be finite and mean difference consistent with sign
    val t = graft.operators.Aggregations.queries("agg_ttest")(spark, sfDir)
    t.collect().foreach { r =>
      val (ma, mb) = (r.getDouble(r.fieldIndex("mean_a")),
        r.getDouble(r.fieldIndex("mean_b")))
      val ts = r.getDouble(r.fieldIndex("t_stat"))
      assert(!ts.isNaN && !ts.isInfinite)
      assert((ma - mb) * ts >= 0, "t carries the sign of the mean difference")
    }
  }
}
