package graft

import org.apache.spark.sql.functions._

/** Round-15 pins: the r14 verdict's carried items — the decimal128
  * output re-typing (STRING canary path, covered in Round14Spec's
  * updated recounts) and the new `pipeline_perplexity_filter` rung
  * (per-doc bigram cross-entropy under the SHARED text_kneser_ney
  * model), whose scoring and selection laws are recounted here against
  * a fully independent local fold. */
class Round15Spec extends SparkTestBase {

  test("pipeline_perplexity_filter: full local recount under the shipped KN model") {
    // 1. the model AS SHIPPED by the declared KN query (same session)
    val model = SparkEntry.queries("text_kneser_ney")(spark, sfDir)
      .select(col("w1"), col("w2"), col("pkn_micro"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    // 2. independent per-doc fold: same whitespace tokenization, same
    //    floor(ln(1e6 / max(pkn, 1)) * 1e6) micro-nat term, plain Scala
    val docs = U.tbl(spark, sfDir, "documents")
      .select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val local = docs.map { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val bgs = if (toks.length >= 2) toks.sliding(2).toSeq else Seq.empty
      val scoredTerms = bgs.flatMap(p => model.get((p(0), p(1))))
        .map(pkn => math.floor(
          math.log(1000000.0 / math.max(pkn, 1L)) * 1000000.0).toLong)
      (id, (bgs.length.toLong, scoredTerms.length.toLong, scoredTerms.sum))
    }.toMap
    val totNll = local.values.map(_._3).sum
    val totN = local.values.map(_._2).sum
    assert(totN > 0, "fixture must give the KN model nonzero coverage")
    val corpusAvg = totNll / totN
    // 3. the shipped rows must match the fold column for column
    val rows = SparkEntry.queries("pipeline_perplexity_filter")(spark, sfDir)
      .collect()
    assert(rows.length == docs.length, "one verdict per document")
    var kept = 0
    var dropped = 0
    rows.foreach { r =>
      val id = r.getLong(0)
      val (nb, ns, nll) = local(id)
      assert(r.getLong(1) == nb, s"doc $id n_bigrams")
      assert(r.getLong(2) == ns, s"doc $id n_scored")
      assert(r.getLong(3) == nll, s"doc $id nll_sum_micro")
      assert(r.getLong(5) == corpusAvg, s"doc $id corpus_avg_micro")
      if (ns > 0) {
        val avg = nll / ns
        assert(r.getLong(4) == avg, s"doc $id avg_nll_micro")
        // the selection law: keep <=> the doc reads MORE like the corpus
        // (lower cross-entropy) than the corpus-average document
        assert(r.getBoolean(6) == (avg <= corpusAvg), s"doc $id keep")
        if (avg <= corpusAvg) kept += 1 else dropped += 1
      } else {
        assert(r.isNullAt(4), s"doc $id avg must be NULL with no coverage")
        assert(r.isNullAt(6), s"doc $id keep must be NULL with no coverage")
      }
    }
    // the filter must actually split the corpus (a degenerate all-keep /
    // all-drop threshold would make the rung vacuous on this fixture)
    assert(kept > 0, "some documents must pass the filter")
    assert(dropped > 0, "some documents must fail the filter")
  }

  test("pipeline_perplexity_filter: common-bigram docs score as more corpus-like") {
    // the low-perplexity-looks-like-target direction, checked between
    // two INDEPENDENTLY derived per-doc quantities: (a) the shipped
    // avg_nll_micro, and (b) the mean corpus FREQUENCY (model cb) of
    // each doc's covered bigrams, folded locally from the raw text +
    // the shipped KN model — docs built from the corpus's common
    // bigrams must average lower cross-entropy than docs built from
    // its rare ones (the CCNet selection direction).
    val model = SparkEntry.queries("text_kneser_ney")(spark, sfDir)
      .select(col("w1"), col("w2"), col("cb"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val freq = U.tbl(spark, sfDir, "documents")
      .select(col("doc_id").cast("long"), col("text"))
      .collect().flatMap { r =>
        val toks = r.getString(1).split(" ").filter(_.nonEmpty)
        val cbs =
          if (toks.length < 2) Seq.empty
          else toks.sliding(2).toSeq.flatMap(p => model.get((p(0), p(1))))
        if (cbs.isEmpty) None
        else Some(r.getLong(0) -> cbs.map(_.toDouble).sum / cbs.length)
      }.toMap
    val scored = SparkEntry.queries("pipeline_perplexity_filter")(spark, sfDir)
      .filter(col("n_scored") > 0)
      .select(col("doc_id"), col("avg_nll_micro"))
      .collect().map(r => (freq(r.getLong(0)), r.getLong(1).toDouble))
      .sortBy(_._1)
    assert(scored.length >= 20, "fixture too small for the direction check")
    val q = scored.length / 4
    val rareNll = scored.take(q).map(_._2).sum / q       // least common bigrams
    val commonNll = scored.takeRight(q).map(_._2).sum / q // most common bigrams
    assert(commonNll < rareNll,
      s"docs of common bigrams must score more corpus-like " +
        s"(common $commonNll vs rare $rareNll micro-nats)")
  }
}
