package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan

/** Plan-regression guards: the scale story depends on these physical-plan
  * properties, so they are asserted, not assumed. */
class PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q05: shipdate filter reaches the parquet scan; schema is pruned") {
    val p = plan(graft.queries.Relational.q05Pricing(spark, sf))
    assert(p.contains("PushedFilters") && p.contains("LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_partkey"), "unused columns must be pruned from the scan")
  }

  test("q06: dimension joins broadcast; fact scan prunes to 3 columns") {
    val p = plan(graft.queries.Relational.q06RegionRevenue(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "date filter must push into the orders scan")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>"))
  }

  test("q07: top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan(graft.queries.Relational.q07TopCustomers(spark, sf))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q01: scan filters execute BEFORE the probe boundary") {
    val df = graft.queries.VideoQueries.q01Build(spark, sf)
    val p = plan(df)
    // the banned-dir/extension filter must appear below (after in text) the
    // SerializeFromObject..MapPartitions block, i.e. the probe sees only
    // filtered rows
    val probeIdx = p.indexOf("MapPartitions")
    val filterIdx = p.lastIndexOf("arrays_overlap")
    assert(probeIdx >= 0 && filterIdx >= 0 && filterIdx > probeIdx,
      s"filter (at $filterIdx) must be upstream of the probe (at $probeIdx)")
  }

  test("q22: poly_hash runs inside whole-stage codegen") {
    // AQE's pre-execution plan hides codegen stage markers — turn it off
    // for the inspection only
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = graft.ext.TextAnalysis.fingerprints(Tables.documents(spark, sf))
      val p = plan(df)
      // the projection containing poly_hash carries a codegen stage id (*(n))
      val line = p.linesIterator.find(_.contains("poly_hash")).get
      assert(line.contains("*("), s"poly_hash fell out of codegen: $line")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("salted aggregation equals plain aggregation") {
    val orders = Tables.orders(spark, sf)
    val plainC = orders.groupBy(col("o_orderstatus")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = graft.operators.Skew.saltedCount(orders, col("o_orderstatus"), 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plainC)
    val plainS = orders.groupBy(col("o_orderstatus"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val saltedS = graft.operators.Skew.saltedSum(orders, col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long"), 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(saltedS == plainS)
  }

  test("bucketed tables co-locate the join: no shuffle exchange on the keys") {
    val o = Tables.orders(spark, sf)
    val li = Tables.lineitem(spark, sf)
    o.write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    li.write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")
    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").count()
    val p = plan(joined)
    val joinSection = p.substring(p.indexOf("Join"))
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
           !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join must not reshuffle join keys:\n${p.take(1500)}")
    // sanity: same result as the unbucketed join
    assert(joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }

  test("q17/q18/q24/q31: similarity plans are declarative — no driver kernels") {
    val names = Seq("q17_cosine_topk", "q18_ivf_topk",
      "q24_embedding_neardup", "q31_signlsh_neardup")
    for (name <- names) {
      val p = plan(SparkEntry.queries(name)(spark, sf))
      assert(!p.contains("MapPartitions"),
        s"$name regressed to an opaque kernel — the corpus must stay relational")
      assert(!p.contains("Scan ExistingRDD"),
        s"$name must not materialize data through the driver")
    }
    // scoring runs through the codegen vector expressions, and the small
    // side is broadcast (corpus side stays a streaming scan)
    val p17 = plan(SparkEntry.queries("q17_cosine_topk")(spark, sf))
    assert(p17.contains("vec_dot") && p17.contains("BroadcastExchange"))
    // top-k reduces through the bounded-heap aggregator: the |Q|x|C|
    // scored relation must never pass through a WindowExec sort
    assert(!p17.contains("Window"),
      s"q17 top-k regressed to a window sort over the scored relation:\n${p17.take(2000)}")
    val p18 = plan(SparkEntry.queries("q18_ivf_topk")(spark, sf))
    assert(p18.contains("vec_dist2") && p18.contains("vec_dot"))
  }

  test("q18: argmin assignment and top-k both aggregate — no window sorts at all") {
    val p = plan(SparkEntry.queries("q18_ivf_topk")(spark, sf))
    // the |V|x|centroids| argmin reduces through aggregate partials and
    // the per-(query,cell) top-k through the bounded-heap aggregator —
    // nothing in the plan may sort a scored relation
    assert(!p.contains("Window"),
      s"scored relation leaked into a window sort:\n${p.take(2000)}")
    assert(p.contains("min(struct(d2"),
      "argmin must plan as a struct-min aggregate (partial-combinable)")
  }

  test("q16: single pass — no persist, documents scanned once") {
    val p = plan(graft.ext.Dedup.ngramJaccardPairs(Tables.documents(spark, sf)))
    assert(!p.contains("InMemoryTableScan"),
      "q16 must not cache (the round-2 persist leaked into the session)")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"documents must be scanned exactly once, saw $scans")
  }

  test("q27: one scan of orders serves count/min/max AND medians") {
    val p = plan(graft.queries.Relational.q27CubeStats(spark, sf))
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"orders must be scanned exactly once, saw $scans")
    // a single hash-partition exchange feeds both window frames
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 1, s"grouping sets must share one shuffle, saw $hashEx:\n${p.take(2000)}")
  }

  test("q34: top-K vocabulary plans as TakeOrderedAndProject over one scan") {
    val p = plan(SparkEntry.queries("q34_vocab")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"),
      "top-K must use per-partition heaps, not a global sort")
    assert("Scan parquet".r.findAllIn(p).length == 1)
  }

  test("q37: histogram quantiles scan documents once, aggregate before windowing") {
    val p = plan(SparkEntry.queries("q37_length_quantiles")(spark, sf))
    assert("Scan parquet".r.findAllIn(p).length == 1)
    // the corpus reduces to bin counts BEFORE any window: the window input
    // is the aggregated relation, so no corpus-sized sort exists
    val aggIdx = p.lastIndexOf("HashAggregate")
    val winIdx = p.indexOf("Window")
    assert(winIdx >= 0 && aggIdx > winIdx,
      "bin-count aggregation must sit below the cumulative window")
  }

  test("q42: exactly-once is a predicate, not a distinct — and no cartesian") {
    val p = plan(SparkEntry.queries("q42_signlsh_multiband")(spark, sf))
    // pair dedup must come from the generated first-matching-band bit
    // predicate; an aggregate/distinct over (id_a, id_b) would mean the
    // same pair was produced twice and shuffled to be collapsed
    assert(!p.contains("HashAggregate(keys=[id_a"),
      s"q42 regressed to a distinct pass over emitted pairs:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "q42 candidates must come from the banded equi-join, never all pairs")
  }

  test("q44: grouped top-k aggregates with k-row partials, no window, one scan") {
    val p = plan(SparkEntry.queries("q44_top_docs_per_source")(spark, sf))
    assert(!p.contains("Window"),
      s"q44 must not sort the corpus under a window:\n${p.take(1500)}")
    assert(p.contains("ObjectHashAggregate"),
      "bounded-heap aggregator should plan as ObjectHashAggregate")
    assert("Scan parquet".r.findAllIn(p).length == 1)
  }

  test("q45: corpus side never shuffles — bloom prefilter + broadcast semi-join") {
    val p = plan(SparkEntry.queries("q45_eval_contamination")(spark, sf))
    assert(p.contains("BroadcastExchange"),
      "eval fingerprints must broadcast for the verify join")
    // the TRAINING side must reach the semi-join via scan+filter only —
    // in the tree print, the stream-side subtree sits between the join
    // node and its BroadcastExchange child; a shuffle of eval's tiny
    // distinct below the broadcast is fine, a corpus shuffle is not
    val join = p.indexOf("BroadcastHashJoin")
    val bcast = p.indexOf("BroadcastExchange", join)
    assert(join >= 0 && bcast > join, s"expected a broadcast semi-join:\n${p.take(1500)}")
    val trainSide = p.substring(join, bcast)
    assert(!trainSide.contains("Exchange"),
      s"training corpus leaked into a shuffle:\n$trainSide")
    // and the bloom prefilter reaches the corpus SCAN (pushed data filter)
    assert(trainSide.contains("UDF"),
      "bloom prefilter must sit on the corpus side before the join")
  }

  test("q48: verdicts are one scan-speed projection — no mid-plan shuffle") {
    val p = plan(SparkEntry.queries("q48_filter_verdicts")(spark, sf))
    assert("Scan parquet".r.findAllIn(p).length == 1)
    assert(!p.contains("Exchange hashpartitioning"),
      s"the verdict must not shuffle the corpus:\n${p.take(1500)}")
  }

  test("q49: corpus probes the vocabulary via broadcast, never shuffles by token") {
    val p = plan(SparkEntry.queries("q49_token_rarity")(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      "vocab join must broadcast (Zipf-bounded vocabulary)")
    // the only corpus-sized hash shuffle is the final per-doc aggregation;
    // the token-keyed exchange feeds the small vocab aggregate only
    val joinIdx = p.indexOf("BroadcastHashJoin")
    val corpusSide = p.substring(0, joinIdx)
    assert(!corpusSide.contains("Exchange hashpartitioning(token"),
      s"corpus side leaked into a token shuffle:\n${p.take(2000)}")
  }

  test("q51: shard plan is one scan + one source-partitioned window") {
    val p = plan(SparkEntry.queries("q51_shard_plan")(spark, sf))
    assert("Scan parquet".r.findAllIn(p).length == 1)
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"one shuffle by source only:\n${p.take(1500)}")
  }

  test("q53: bigram top-K plans as TakeOrderedAndProject over one scan") {
    val p = plan(SparkEntry.queries("q53_bpe_pairs")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"),
      "pair-vocabulary top-K must use per-partition heaps, not a global sort")
    assert("Scan parquet".r.findAllIn(p).length == 1)
  }

  test("q54: containment candidates come from the fingerprint bucket join — no cartesian") {
    val p = plan(SparkEntry.queries("q54_prefix_contained")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"q54 must never compare all pairs:\n${p.take(1500)}")
    assert("Scan parquet".r.findAllIn(p).length == 1,
      "one scan feeds the bucket aggregation")
  }

  test("q56: stratified sample aggregates with k-row partials, no window") {
    val p = plan(SparkEntry.queries("q56_stratified_sample")(spark, sf))
    assert(!p.contains("Window"),
      s"q56 must not rank the corpus under a window:\n${p.take(1500)}")
    assert(p.contains("ObjectHashAggregate"),
      "bounded-heap aggregator should plan as ObjectHashAggregate")
  }

  test("q57: candidate filter sits below the exact count — no window, no extra scan") {
    val p = plan(SparkEntry.queries("q57_heavy_hitters")(spark, sf))
    assert(!p.contains("Window"), "heavy hitters must never sort the gram stream")
    // the broadcast-sketch prefilter must run scan-side, upstream of the
    // aggregate's shuffle (textually BELOW HashAggregate in the plan tree)
    val aggIdx = p.indexOf("HashAggregate")
    val filtIdx = p.lastIndexOf("Filter")
    assert(aggIdx >= 0 && filtIdx > aggIdx,
      "CMS candidate filter must execute before the exact-count shuffle")
  }

  test("q59: block dedup reuses the keeper shuffle for the join — no window, no cartesian") {
    val p = plan(SparkEntry.queries("q59_block_dedup")(spark, sf))
    assert(!p.contains("Window") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"),
      s"block dedup must stay hash-shaped:\n${p.take(1500)}")
    // keeper aggregation and the block join key are identical, so the
    // plan needs at most: block shuffle (x2 sides), doc rollup, sort
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 5, s"unexpected extra shuffles ($exchanges):\n${p.take(2000)}")
  }

  test("q61: novelty reuses the distinct-pair exchange; no window over the corpus") {
    // AQE resolves exchange reuse at runtime and the pre-execution plan
    // hides it — inspect the statically-planned form (q22's pattern)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = plan(SparkEntry.queries("q61_novelty")(spark, sf))
      assert(!p.contains("Window"), "novelty must never window-sort the gram relation")
      assert(p.contains("ReusedExchange"),
        "the df aggregate and the join probe must share the distinct exchange, " +
          s"not rescan the corpus:\n${p.take(1500)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q63: domain mix aggregates with k-row partials; quota join broadcasts") {
    val p = plan(SparkEntry.queries("q63_domain_mix")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
    assert(p.contains("ObjectHashAggregate"),
      "selection must ride the bounded-heap aggregator")
    assert(p.contains("BroadcastHashJoin"),
      "the |sources|-row quota relation must broadcast")
  }

  test("q64: stitching is a plain equi-join on the boundary key") {
    val p = plan(SparkEntry.queries("q64_doc_stitches")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"boundary match must stay an equi-join:\n${p.take(1500)}")
  }

  test("q66/q68: LM and tf-idf model joins stay equi-joins; no corpus window") {
    val lm = plan(SparkEntry.queries("q66_bigram_lm")(spark, sf))
    assert(!lm.contains("Window"), "per-doc LM score is an aggregate, not a window")
    assert(!lm.contains("CartesianProduct"),
      "the only cross join is the broadcast 1-row vocab scalar")
    val tf = plan(SparkEntry.queries("q68_tfidf_terms")(spark, sf))
    assert(!tf.contains("row_number"),
      "per-doc top terms must ride the bounded heap, never a ranking window")
    assert(tf.contains("ObjectHashAggregate"),
      "top terms must aggregate with k-row partials")
    assert(tf.linesIterator.count(_.contains("Generate explode")) == 1,
      "one corpus pass: df must come from the tf aggregate, not a re-explode")
  }

  test("q69: quantized search broadcasts queries and aggregates top-k — no sort of pairs") {
    val p = plan(SparkEntry.queries("q69_quantized_topk")(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the query side must broadcast (q17's shape)")
    assert(!p.contains("Window"),
      "top-k must ride the bounded heap, never sort the scored relation")
    assert(p.contains("vec_dot_int"),
      "scoring must run the native integer-dot kernel")
  }

  test("q70: scrub is one scan-speed projection — no shuffle but the sort") {
    val p = plan(SparkEntry.queries("q70_pii_scrub")(spark, sf))
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1,
      s"scrub must be a pure projection (one presentation sort), got:\n${p.take(1500)}")
  }

  test("q71: one corpus pass — the (source,token) aggregate is shared by all consumers") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = plan(SparkEntry.queries("q71_source_drift")(spark, sf))
      assert(p.contains("ReusedExchange"),
        "source-mass, corpus-count, and the probe must share one exchange")
      assert(!p.contains("CartesianProduct"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q72: substring dedup is linear — equi-join on the window hash, no cartesian") {
    val p = plan(SparkEntry.queries("q72_substring_dups")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "the shared-window probe must stay an equi-join on h")
    assert(p.contains("rolling_hashes"),
      "windows must come from the O(n) rolling kernel, not per-window substrings")
    // the kernel must be a real codegen expression (not CodegenFallback:
    // fallback would run the roll through interpreted eval per row and
    // break the projection's whole-stage span)
    val e = graft.functions.RollingHashes(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 5, 31L, 1000000007L)
    assert(!e.isInstanceOf[
      org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback],
      "rolling_hashes must implement doGenCode")
  }

  test("q77: sampled collocations keep q67's shape — sample filter at the scan, top-K cut") {
    val p = plan(SparkEntry.queries("q77_colloc_sampled")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"),
      "the top-K must stay a bounded cut, not a global sort")
    assert(p.toLowerCase.contains("pushedfilters") || p.contains("pmod"),
      "the doc_id % mod sample must filter before the bigram explode")
    assert(!p.contains("CartesianProduct"))
  }

  test("q80: quantized IVF keeps the no-window shape end to end") {
    val p = plan(SparkEntry.queries("q80_quantized_ivf")(spark, sf))
    assert(!p.contains("Window"),
      "assignment, probes and top-k must all be aggregates, never window sorts")
    assert(p.contains("vec_dot_int"),
      "distances and ranking must run the native integer-dot kernel")
    assert(p.contains("min(struct(d2"),
      "argmin must stay the partial-combinable struct-min")
  }

  test("q73: assignment aggregates against broadcast centroids; update has no window") {
    val p = plan(SparkEntry.queries("q73_kmeans_step")(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin"),
      "centroid table must broadcast (q18's assignment shape)")
    assert(!p.contains("Window"),
      "argmin must be the struct-min aggregate, never a ranking window")
    assert(p.contains("vec_dot_int"),
      "distances must run the native integer-dot kernel")
  }

  test("q74: pHash pairs come from the band bucket join — no cartesian, no distinct") {
    val p = plan(SparkEntry.queries("q74_phash_neardup")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "candidates must come from the (band, bkey) equi-join")
    assert(!p.contains("HashAggregate(keys=[id_a"),
      "exactly-once is the first-match predicate, not a dedup aggregate")
  }

  test("nearDupsAuto: the rewrite rule lowers the marker by index presence") {
    import graft.ext.Similarity
    val emb = Tables.embeddings(spark, sf)
    // no index column -> the exact broadcast all-pairs kernel
    val exact = Similarity.nearDupsAuto(emb)
    val pe = plan(exact)
    assert(!pe.contains("CosineNearDups"), "marker must be rewritten away")
    assert(pe.contains("BroadcastNestedLoopJoin"),
      "exact strategy is the broadcast kernel")
    // lsh_bands index present -> banded candidate equi-join, never a
    // cartesian or NL join over the CORPUS. The only NL join allowed is
    // the one-row dropped_keys scalar broadcast (n x 1, the kept-bucket
    // first-match side input) — its presence also proves the rewrite rule
    // folded the kernel's broadcast() hint into Join.hint instead of
    // leaking a bare ResolvedHint past the optimizer into the planner.
    val banded = Similarity.nearDupsAuto(
      Similarity.withLshBands(emb, bands = 12, bandBits = 1))
    val pb = plan(banded)
    assert(!pb.contains("CosineNearDups"), "marker must be rewritten away")
    assert(!pb.contains("CartesianProduct"), "no cartesian over the corpus")
    val nlJoins = pb.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(nlJoins == 1 && pb.contains("dropped_keys"),
      s"the only NL join must be the dropped_keys scalar broadcast, saw $nlJoins")
    assert(pb.contains("vec_dot"), "survivors run the exact verify kernel")
    // same declared semantics, same result: at 12 one-bit bands every
    // fixture pair collides in some band, so the banded rewrite must
    // reproduce the exact kernel's relation row for row
    val got = banded.collect().map(_.toSeq).toSeq
    val want = Similarity.embeddingNearDups(emb).collect().map(_.toSeq).toSeq
    assert(want.nonEmpty && got == want,
      s"banded rewrite diverged: ${got.size} vs ${want.size} rows")
    // pruning regression: a consumer needing NONE of the marker's columns
    // (bare count) must not let ColumnPruning strip the child before the
    // rule fires — the marker declares references = child.outputSet
    assert(Similarity.nearDupsAuto(
      Similarity.withLshBands(emb, bands = 12, bandBits = 1)).count() == want.size)
    assert(Similarity.nearDupsAuto(emb).count() == want.size)
  }

  test("GraftExtensions injects poly_hash + vector functions for SQL-only sessions") {
    // the injection list accepts our builder (a bad signature would throw)
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // and the registered functions resolve from SQL text with the right values
    graft.functions.PolyHash.register(spark)
    graft.functions.VectorOps.register(spark)
    val r = spark.sql("SELECT poly_hash('abc', 31, 1000000007) AS h").collect()
    assert(r.head.getLong(0) == graft.functions.PolyHash.eval("abc", 31, 1000000007))
    val v = spark.sql(
      "SELECT vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d, " +
      "vec_dist2(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS e").collect().head
    assert(v.getDouble(0) == 11.0 && v.getDouble(1) == 8.0)
    // sign_lsh_sig is 2-arg ONLY (same arity as the extension injection);
    // a 1-arg call must fail analysis cleanly, not bucket with a silent
    // default width
    val sig = spark.sql(
      "SELECT sign_lsh_sig(array(1.0F, 2.0F), 3) AS s").collect().head
    assert(sig.getLong(0) >= 0 && sig.getLong(0) < 8)
    intercept[Exception] {
      spark.sql("SELECT sign_lsh_sig(array(1.0F, 2.0F)) AS s")
    }
  }

  test("q83 semantic dedup: pair generation is a hash join on cell, no cartesian") {
    val p = plan(graft.ext.Similarity.semanticDedup(Tables.embeddings(spark, sf)))
    assert(!p.contains("CartesianProduct"))
    // the in-cell pair join is an equi-join on the cell key (hash or SMJ),
    // not a nested loop over the corpus
    val joinLines = p.linesIterator.filter(l =>
      (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
       l.contains("BroadcastHashJoin")) && l.contains("cell")).toSeq
    assert(joinLines.nonEmpty, s"no equi-join on cell found:\n$p")
  }

  test("q84/q85: tiny side broadcasts (thresholds, eval grams)") {
    val p84 = plan(graft.ext.TextAnalysis.qualityGate(Tables.documents(spark, sf)))
    assert(p84.contains("BroadcastHashJoin"), "per-source thresholds must broadcast")
    val p85 = plan(graft.ext.TextAnalysis.contaminationOverlap(Tables.documents(spark, sf)))
    assert(p85.contains("BroadcastHashJoin"), "eval gram set must broadcast")
    assert(!p85.contains("CartesianProduct"))
  }

  test("q86: decorrelated plan scans lineitem exactly twice, no per-row re-scan") {
    val p = plan(graft.queries.Relational.q86ScalarSubquery(spark, sf))
    val scans = p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("lineitem"))
    assert(scans == 2, s"expected main + aggregate scans, got $scans:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q87: EXISTS lowers to a left-semi join") {
    val p = plan(graft.queries.Relational.q87ExistsSubquery(spark, sf))
    assert(p.contains("LeftSemi"), s"EXISTS must plan as semi join:\n$p")
  }

  test("q92: the source filter prunes partitions at listing time") {
    val df = graft.sources.Partitioned.prunedScan(spark, sf)
    val p = plan(df)
    val scanLine = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("source"),
      s"filter must resolve as PartitionFilters on the scan:\n$p")
    // the physical proof: the executed scan reads exactly the kept
    // partitions' files (inputFiles would show the PRE-pruning listing)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df2 = graft.sources.Partitioned.prunedScan(spark, sf)
      df2.collect()
      val scans = df2.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty)
      val nFiles = scans.head.metrics("numFiles").value
      assert(nFiles == graft.sources.Partitioned.KeepSources.length,
        s"expected ${graft.sources.Partitioned.KeepSources.length} files read, got $nFiles")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q107: join-driven dynamic partition pruning reaches the fact scan") {
    // AQE off so the executed plan exposes FileSourceScanExec directly
    // (same discipline as the q92 metric check)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = graft.sources.Partitioned.dppScan(spark, sf)
      df.collect()
      val scans = df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      val fact = scans.find(_.partitionFilters.nonEmpty)
        .getOrElse(fail(s"no partitioned fact scan in:\n${df.queryExecution.executedPlan}"))
      // plan shape: the partition filter is a runtime DPP subquery, not a
      // static literal (no source predicate exists anywhere in the query)
      assert(fact.partitionFilters.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression])),
        s"fact scan must carry a dynamicpruning PartitionFilter:\n$fact")
      // physical effect: only the dim-matching partitions' files are read
      // (the layout writes exactly one file per source directory)
      val kept = spark.read.parquet(graft.sources.Partitioned.dimLayout(spark, sf))
        .filter(col("grp") === graft.sources.Partitioned.DppGroup).count()
      val all = spark.read.parquet(graft.sources.Partitioned.dimLayout(spark, sf)).count()
      val nFiles = fact.metrics("numFiles").value
      assert(kept < all, "fixture must have prunable partitions")
      assert(nFiles == kept,
        s"expected $kept of $all partition files read, got $nFiles")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q66: one corpus shuffle — doc_id repartition feeds both aggregates, model joins broadcast") {
    // The round-8 shape: the occurrence stream exchanges ONCE (explicit
    // doc_id hash), the (doc_id, gram) pre-aggregation and the final
    // per-doc aggregate both reuse it (clustering on a key subset), and
    // the gram model arrives by broadcast. Losing any leg shows up here:
    // a composite-key or gram-side exchange of the doc relation, or the
    // model join degrading to sort-merge.
    val p = plan(graft.ext.Lm.bigramLmScores(Tables.documents(spark, sf)))
    assert("hashpartitioning\\(doc_id#\\d+L?, gram".r.findFirstIn(p).isEmpty,
      "the (doc_id, gram) aggregate must reuse the doc_id repartition, not add its own exchange")
    assert("BroadcastHashJoin \\[gram".r.findFirstIn(p).isDefined,
      "the (gram, p_ppm) model must join as a broadcast")
    assert(!p.contains("SortMergeJoin"),
      "no leg of q66 may fall back to a sort-merge join")
    assert(p.contains("REPARTITION_BY_COL"),
      "the single corpus exchange is the explicit doc_id repartition")
  }

  test("q115: compaction hits the per-dir file target, leaves the prior version untouched, flips the resolver") {
    import java.nio.file.{Files, Path}
    import scala.jdk.CollectionConverters._
    val root = graft.sources.Compaction.fragmentedRoot(spark, sf)
    val v0 = root.resolve("v0")
    def parquetFiles(v: Path): Map[String, List[String]] =
      Files.list(v).iterator().asScala.filter(p =>
        Files.isDirectory(p) && p.getFileName.toString.startsWith("source="))
        .map(d => d.getFileName.toString ->
          Files.list(d).iterator().asScala.map(_.getFileName.toString)
            .filter(_.endsWith(".parquet")).toList.sorted)
        .toMap
    val pre = parquetFiles(v0)
    assert(pre.values.map(_.size).sum > pre.size,
      "v0 must actually be fragmented (more files than partition dirs)")
    val next = graft.sources.Compaction.compact(spark, root)
    val post = parquetFiles(next)
    // per-dir file count = ceil(rows / target), exactly
    val target = graft.sources.Compaction.TargetRecords
    spark.read.parquet(v0.toString).groupBy("source").count().collect()
      .foreach { r =>
        val want = ((r.getLong(1) + target - 1) / target).toInt
        val got = post(s"source=${r.getString(0)}").size
        assert(got == want,
          s"${r.getString(0)}: expected $want files at target=$target, got $got")
      }
    assert(post.values.map(_.size).sum < pre.values.map(_.size).sum,
      "compaction must shrink the total file count")
    // copy-on-write: the prior version's listing is byte-for-byte intact
    assert(parquetFiles(v0) == pre, "v0 must not be touched by compaction")
    // last-write-wins resolution picks the newly published version
    assert(graft.sources.Compaction.latestVersion(root) == next)
    // content identity, row for row
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val a = spark.read.parquet(v0.toString)
      .select(cols.map(col): _*).orderBy("doc_id").collect().toSeq
    val b = spark.read.parquet(next.toString)
      .select(cols.map(col): _*).orderBy("doc_id").collect().toSeq
    assert(a == b, "compacted content must equal the original")
  }

  test("q110: AQE splits the hot key's shuffle partition (skew=true on the executed join)") {
    // the SAME conf set the gate runs under (shared definition — a
    // drifted copy would assert skew=true under a configuration the
    // gate no longer uses)
    graft.operators.Skew.withSkewConfs(spark) {
      // sf0.01 (the correctness-gate scale): the hot key carries ~18k
      // rows — comfortably past the lowered skew threshold, where
      // sf0.001's 2k rows all fit under it and only coalesce
      val df = graft.operators.Skew.skewedJoinFrame(spark, TestSpark.sf01)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE must mark the hot-key join partition skewed and split it:\n$p")
    }
  }

  test("q119: runtime Bloom filter prunes the fact side before its shuffle") {
    // the SAME conf set the gate runs under (shared definition — the
    // q110 discipline)
    graft.operators.RuntimeFilter.withBloomConfs(spark) {
      val df = graft.operators.RuntimeFilter.bloomJoinFrame(spark, TestSpark.sf01)
      // optimizedPlan: InjectRuntimeFilter is a logical rule; asserting
      // there keeps the test independent of AQE's physical re-planning
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        s"fact side must carry a bloom might_contain predicate:\n$opt")
      assert(opt.contains("bloom_filter_agg"),
        s"creation side must build the bloom via bloom_filter_agg:\n$opt")
      // the predicate must sit on the LINEITEM (application) side, below
      // the join — i.e. the filter prunes before the fact shuffle
      val phys = df.queryExecution.executedPlan.toString
      assert(phys.contains("might_contain"),
        s"bloom predicate must survive into the physical plan:\n$phys")
      // physical effect, not just plan shape: the bloom filter drops
      // most fact rows BEFORE the shuffle (creation side keeps ~4% of
      // orders; bloom false positives add a few percent back)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val df2 = graft.operators.RuntimeFilter.bloomJoinFrame(spark, TestSpark.sf01)
        df2.collect()
        val scans = df2.queryExecution.executedPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.schema.fieldNames.contains("l_orderkey") => f
        }
        assert(scans.nonEmpty, "lineitem scan not found")
        val filters = df2.queryExecution.executedPlan.collect {
          case f: org.apache.spark.sql.execution.FilterExec
            if f.condition.toString.contains("might_contain") => f
        }
        assert(filters.nonEmpty, "bloom FilterExec not found")
        val scanned = scans.head.metrics("numOutputRows").value
        val kept = filters.head.metrics("numOutputRows").value
        assert(kept < scanned / 2,
          s"bloom must prune most fact rows pre-shuffle: kept $kept of $scanned")
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    // under session defaults the fixture is below the 10 GB application
    // threshold: no injection — the conf window scales thresholds, it
    // does not force behavior the optimizer wouldn't do at real scale
    val plain = graft.operators.RuntimeFilter.bloomJoinFrame(spark, TestSpark.sf01)
    assert(!plain.queryExecution.optimizedPlan.toString.contains("might_contain"),
      "bloom filter must NOT inject under default thresholds at fixture scale")
  }

  test("q120: one doc_id exchange feeds both aggregates; weight table joins broadcast") {
    // same discipline as q66's guard: the token stream exchanges ONCE
    // (explicit doc_id hash), the (doc_id, bucket) count and the final
    // per-doc score both reuse it, and the 4k-row model is a broadcast
    val p = plan(graft.ext.TextAnalysis.classifierScores(Tables.documents(spark, sf)))
    assert("hashpartitioning\\(doc_id#\\d+L?, bucket".r.findFirstIn(p).isEmpty,
      "the (doc_id, bucket) count must reuse the doc_id repartition, not add its own exchange")
    assert("BroadcastHashJoin \\[bucket".r.findFirstIn(p).isDefined,
      "the (bucket, weight) model must join as a broadcast")
    assert(!p.contains("SortMergeJoin"),
      "no leg of q120 may fall back to a sort-merge join")
    assert(p.contains("REPARTITION_BY_COL"),
      "the single corpus exchange is the explicit doc_id repartition")
  }

  test("q121: z-order layout prunes more files than linear; executed scan reads only the keep-set") {
    import graft.sources.ZOrder
    val (zPath, linPath) = ZOrder.layouts(spark, TestSpark.sf01)
    val keptZ = ZOrder.keptFiles(spark, zPath)
    val keptLin = ZOrder.keptFiles(spark, linPath)
    val total = spark.read.parquet(zPath).select(input_file_name()).distinct().count()
    assert(total == ZOrder.NFiles, s"layout must produce ${ZOrder.NFiles} files, got $total")
    // the point of the curve: the day-narrow box prunes the z layout
    // but NOT the user-linear one (day min/max spans ~everything in
    // every user-range file)
    assert(keptZ.size < keptLin.size,
      s"z-order must touch fewer files (${keptZ.size}) than linear (${keptLin.size})")
    assert(keptZ.size <= ZOrder.NFiles / 2,
      s"demo box should keep at most half the z files, kept ${keptZ.size}")
    // the executed scan reads exactly the planned keep-set
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = ZOrder.prunedBoxQuery(spark, TestSpark.sf01)
      df.collect()
      val scans = df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty)
      assert(scans.head.metrics("numFiles").value == keptZ.size,
        s"scan must read exactly the ${keptZ.size} kept files")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q123: dynamic overwrite replaces only the backfilled partition; siblings untouched") {
    import graft.sources.DynamicOverwrite
    // building the table also runs the backfill; stamps were recorded
    // between the two writes
    val df = DynamicOverwrite.backfilledStats(spark, TestSpark.sf01)
    val rows = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (before, after) = DynamicOverwrite.siblingStamps(spark, TestSpark.sf01)
    // physical non-interference: every sibling partition file survived
    // the overwrite as the SAME file (path + mtime), none added/removed
    assert(before.nonEmpty)
    assert(after == before,
      s"sibling partition files must be untouched by the dynamic overwrite; " +
      s"changed: ${(before.toSet diff after.toSet) ++ (after.toSet diff before.toSet)}")
    // the backfilled partition really was replaced (evens only), and a
    // sibling kept its full row count
    val full = Tables.documents(spark, TestSpark.sf01)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Tables.documents(spark, TestSpark.sf01)
      .filter(col("source") === DynamicOverwrite.BackfillSource &&
        expr("(doc_id div 20) % 2 = 0")).count()
    assert(kept > 0 && kept < full(DynamicOverwrite.BackfillSource),
      "fixture must make the rerun a nonempty strict subset")
    assert(rows(DynamicOverwrite.BackfillSource) == kept,
      "backfilled partition must hold exactly the rerun's rows")
    val sibling = full.keys.find(_ != DynamicOverwrite.BackfillSource).get
    assert(rows(sibling) == full(sibling),
      "sibling partitions must keep their full row counts")
    // idempotence — the property the operator exists for: the IDENTICAL
    // backfill job run again (the retry case) leaves the table's
    // content unchanged and siblings physically untouched again
    val statsBefore = df.collect().map(_.toSeq).toSeq
    DynamicOverwrite.rerunBackfill(spark, TestSpark.sf01)
    val statsAfter = DynamicOverwrite.backfilledStats(spark, TestSpark.sf01)
      .collect().map(_.toSeq).toSeq
    assert(statsAfter == statsBefore,
      "re-running the identical backfill must not change table content")
    val (orig, afterRerun) = DynamicOverwrite.siblingStamps(spark, TestSpark.sf01)
    assert(afterRerun == orig,
      "sibling partition files must also survive the rerun untouched")
  }

  test("q108: the window's hash exchange is the only data shuffle; explode adds none") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // drop the presentation orderBy (a range exchange) to expose the
      // computation's own shuffle structure
      val spans = graft.ext.Curation.packedSpans(Tables.documents(spark, sf))
        .groupBy("source", "seq").count() // consumer re-using the window partitioning
      val p = plan(spans)
      val hashExchanges = "Exchange hashpartitioning".r.findAllMatchIn(p).length
      assert(p.contains("Window") && p.contains("Generate"),
        s"expected window + generator explode:\n$p")
      assert(hashExchanges == 1,
        s"span packing must shuffle once (the window's source partition):\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q96/q97: EXISTS pair plans as semi+anti; IN-subquery as semi") {
    val p96 = plan(graft.queries.Relational.q96ChurnedCustomers(spark, sf))
    assert(p96.contains("LeftSemi") && p96.contains("LeftAnti"),
      s"EXISTS/NOT EXISTS must plan as semi + anti joins:\n$p96")
    val p97 = plan(graft.queries.Relational.q97LargeOrders(spark, sf))
    assert(p97.contains("LeftSemi"), s"IN-subquery must plan as semi join:\n$p97")
    assert(!p97.contains("CartesianProduct"))
  }

  test("q101: two-stage distinct plans with no Expand (the count-distinct scale rewrite)") {
    val p = plan(graft.queries.Relational.q101TwoStageDistinct(spark, sf))
    assert(!p.contains("Expand"), s"two-stage rewrite must avoid Expand:\n$p")
    // contrast: MULTIPLE distinct aggregates force Catalyst's Expand
    // (row-multiplication) plan — the shape the two-stage rewrite
    // avoids by construction however many distinct measures stack
    val direct = Tables.events(spark, sf).groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")), countDistinct(col("event_id")))
    assert(plan(direct).contains("Expand"))
  }

  test("q94: the gated bucketed join plans without an exchange on the keys") {
    val p = plan(graft.queries.Relational.q94BucketedJoin(spark, sf))
    val joinSection = p.substring(p.indexOf("Join"))
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
           !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join must not reshuffle join keys:\n${p.take(1500)}")
  }

  test("q125: PQ search is broadcast-only — no sort-merge join, heaps not windows") {
    val p = plan(graft.ext.Similarity.pqTopK(Tables.embeddings(spark, sf)))
    assert(!p.contains("SortMergeJoin"),
      "codebook/LUT/candidate joins must all broadcast — a shuffled join " +
      "on the encoded corpus breaks the ADC scale shape")
    assert(!p.contains("Window"), "rankings must be bounded heaps, not window sorts")
    assert(p.contains("partial_topkbyscore"),
      "candidate + re-rank heaps must combine map-side")
  }

  test("q127: the near-dup exclusion is a broadcast anti-join inside the scoring scan") {
    val p = plan(graft.ext.Similarity.hardNegatives(
      Tables.embeddings(spark, sf), Tables.documents(spark, sf)))
    assert(p.contains("LeftAnti"), "exclusion must plan as an anti-join")
    val anti = p.substring(p.indexOf("LeftAnti") - 200, p.indexOf("LeftAnti"))
    assert(anti.contains("BroadcastHashJoin"),
      s"anti-join must broadcast the banned-pair side, got:\n${anti}")
  }

  test("q142: vacuum deletes only expired versions; retained files untouched, resolver stable") {
    import graft.sources.Compaction
    val root = Compaction.vacuumRoot(spark, sf) // q142's own tree, never q115's
    Compaction.compact(spark, root)
    Compaction.compact(spark, root) // >= 3 versions now exist
    val before = Compaction.versions(root)
    assert(before.size >= 3, s"need versions to reclaim, have ${before.size}")
    val keep = before.takeRight(Compaction.RetainVersions)
    def snap(v: java.nio.file.Path): Seq[(String, Long, java.nio.file.attribute.FileTime)] = {
      val s = java.nio.file.Files.walk(v)
      try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(f => (v.relativize(f).toString, java.nio.file.Files.size(f),
          java.nio.file.Files.getLastModifiedTime(f)))
        .sortBy(_._1)
      finally s.close()
    }
    val snaps = keep.map(snap)
    val deleted = Compaction.vacuum(root)
    assert(deleted.toSet == before.dropRight(Compaction.RetainVersions).toSet,
      "exactly the expired versions must be reclaimed")
    deleted.foreach(d => assert(!java.nio.file.Files.exists(d), s"$d must be gone"))
    assert(Compaction.versions(root) == keep, "retained set unchanged")
    assert(keep.map(snap) == snaps, "retained version files must be byte-untouched")
    assert(Compaction.latestVersion(root) == keep.last, "resolver must be stable")
    assert(spark.read.parquet(keep.last.toString).count() ==
      Tables.documents(spark, sf).count(), "live data intact after vacuum")
  }

  test("q144: time travel reads the pinned version; history untouched by the delete") {
    import graft.sources.Compaction
    val root = Compaction.travelRoot(spark, sf)
    assert(Compaction.versions(root).map(_.getFileName.toString) == Seq("v0", "v1"),
      "exactly the two published versions")
    val docs = Tables.documents(spark, sf)
    val doomed = docs.agg(min(col("source"))).head().getString(0)
    // current read: the delete is visible through the latest-version resolver
    val cur = spark.read.parquet(Compaction.latestVersion(root).toString)
    assert(cur.filter(col("source") === doomed).count() == 0,
      "latest version must not contain the retracted source")
    // pinned read: v0 still serves the FULL corpus after the delete
    val v0 = Compaction.readAt(spark, root, 0)
    assert(v0.count() == docs.count(), "v0 must still be the full corpus")
    assert(v0.filter(col("source") === doomed).count() ==
      docs.filter(col("source") === doomed).count(),
      "the retracted source is fully readable at its historical version")
    // a version that never existed (or was vacuumed) fails loudly
    val ex = intercept[IllegalArgumentException](Compaction.readAt(spark, root, 7))
    assert(ex.getMessage.contains("v7"), "missing version must name itself")
  }

  test("q146: the binned range join plans as a hash join; the naive form nested-loops") {
    val binned = graft.queries.Relational.q146RangeJoin(spark, sf)
    val got = binned.collect().map(_.toSeq).toSeq
    // the RANGE-PREDICATE join is what must change shape: binned, the
    // p_start/p_end comparison rides a BroadcastHashJoin on bin as its
    // residual; naive, it IS a nested loop's condition. (The 1-row binw
    // scalar attach is a broadcast cross join either way — the accepted
    // scalar pattern, not the join under test.)
    def lines(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString.linesIterator.toSeq
    val pl = lines(binned)
    assert(pl.exists(l => l.contains("BroadcastHashJoin") && l.contains("p_start")),
      s"binned: range predicate must be the hash join's residual:\n${pl.mkString("\n")}")
    assert(!pl.exists(l => l.contains("NestedLoopJoin") && l.contains("p_start")),
      s"binned: no nested loop may evaluate the range predicate:\n${pl.mkString("\n")}")
    // identical semantics: the naive inequality join is the witness
    val naive = graft.queries.Relational.naiveRangeJoin(spark, sf)
    val nl = lines(naive)
    assert(nl.exists(l => l.contains("NestedLoopJoin") && l.contains("p_start")),
      s"without the bin key Spark can only nested-loop a range predicate:\n${nl.mkString("\n")}")
    assert(naive.collect().map(_.toSeq).toSeq == got,
      "bin rewrite must not change the join's result")
  }

  test("q154: null-key probe rows bypass the join; split equals the naive left join") {
    val split = graft.operators.Skew.nullSkewJoin(spark, sf)
    val naive = graft.operators.Skew.naiveNullJoin(spark, sf)
    assert(split.collect().map(_.toSeq).toSeq ==
      naive.collect().map(_.toSeq).toSeq,
      "the split must be semantically invisible")
    // split: the join's probe side is isnotnull-filtered AT THE SCAN —
    // null rows take the union branch and never reach the join at all
    // (Catalyst pushes the filter through the CASE key derivation, so
    // it appears as "CASE WHEN … THEN isnotnull(user_id) ELSE false")
    def hasProbeNullFilter(plan: String) =
      plan.contains("isnotnull(attr_key") ||
        plan.contains("THEN isnotnull(user_id")
    val p = split.queryExecution.executedPlan.toString
    assert(hasProbeNullFilter(p),
      s"split plan must filter null keys off the join's probe side:\n$p")
    // naive: a LEFT join must keep null probe keys, so no isnotnull may
    // be inferred on the probe side — every null rides the join
    val np = naive.queryExecution.executedPlan.toString
    assert(!hasProbeNullFilter(np),
      s"naive left join must not filter the probe side:\n$np")
  }

  test("q160: orphan GC removes exactly the debris; published files untouched; idempotent") {
    import graft.sources.Compaction
    import java.nio.file.Files
    val root = Compaction.orphanRoot(spark, sf)
    val debris = Compaction.plantDebris(root)
    debris.foreach(d => assert(Files.exists(d), s"debris $d must be planted"))
    def liveSnap: Seq[(String, Long, java.nio.file.attribute.FileTime)] =
      Compaction.versions(root).flatMap { v =>
        val s = Files.walk(v)
        try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
          .filter(Files.isRegularFile(_))
          .filterNot(p => v.relativize(p).toString.startsWith("_temporary"))
          .map(f => (f.toString, Files.size(f), Files.getLastModifiedTime(f)))
        finally s.close()
      }.sortBy(_._1)
    val before = liveSnap
    val resolverBefore = Compaction.latestVersion(root)
    val deleted = Compaction.orphanGc(root)
    assert(deleted.map(_.getFileName.toString).toSet ==
      Set("_temporary", "v99.inprogress"),
      s"exactly the debris roots must be reclaimed, got $deleted")
    debris.foreach(d => assert(!Files.exists(d), s"$d must be gone"))
    assert(liveSnap == before, "published files must be byte-untouched")
    assert(Compaction.latestVersion(root) == resolverBefore, "resolver stable")
    assert(Compaction.orphanGc(root).isEmpty, "second pass must be a no-op")
    assert(spark.read.parquet(resolverBefore.toString).count() ==
      Tables.documents(spark, sf).count(), "live data intact after GC")
  }

  test("q164: consistent hashing moves docs ONLY to the added shard") {
    import graft.sources.Partitioned
    val m = Partitioned.consistentHashingMoves(spark, sf).collect()
      .map(r => (r.getAs[Int]("old_shard"), r.getAs[Int]("new_shard"),
        r.getAs[Long]("n_docs")))
    val added = Partitioned.ChNewShards - 1
    val movers = m.filter { case (o, n, _) => o != n }
    assert(movers.nonEmpty, "growing the ring must move some docs")
    assert(movers.forall(_._2 == added),
      s"every mover must land on the added shard $added, got ${movers.toSeq}")
    val stay = m.filter { case (o, n, _) => o == n }.map(_._3).sum
    val moved = movers.map(_._3).sum
    assert(stay > moved,
      s"the majority must stay put (stay=$stay, moved=$moved) — mod-N " +
        "resharding would move ~everything")
  }

  test("q139: the as-of join plans through the custom exec with declared exchange+sort") {
    val df = graft.queries.Relational.q139AsofExec(spark, sf)
    df.collect() // materialize so AQE settles the final plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"custom exec missing from plan:\n$p")
    val execIdx = p.indexOf("AsOfJoin")
    val below = p.substring(execIdx)
    // EnsureRequirements must have inserted the declared sorts + shuffles
    assert(below.contains("Sort ["), "children must arrive (key, time)-sorted")
    assert(below.contains("hashpartitioning(user_id"),
      "children must co-partition on the key")
    // the exec's result is identical to the union-window composition
    val viaExec = df.collect().map(_.toSeq)
    val viaWindow = graft.queries.Relational.q25AsofPurchase(spark, sf)
      .collect().map(_.toSeq)
    assert(viaExec.toSeq == viaWindow.toSeq,
      "custom exec and window composition must agree row-for-row")
  }

  test("q137: the gram index prunes shards; pruning is semantically invisible") {
    import graft.sources.TokenIndex
    val (path, idx) = TokenIndex.layoutAndIndex(spark, sf)
    val total = spark.read.parquet(path)
      .select(col("shard")).distinct().count()
    assert(total == TokenIndex.NShards,
      s"layout must produce ${TokenIndex.NShards} shards, got $total")
    val kept = TokenIndex.keptShardCount(spark, sf)
    assert(kept > 0 && kept < TokenIndex.NShards,
      s"index must prune some shards: kept $kept of ${TokenIndex.NShards}")
    assert(idx.size < TokenIndex.NShards * TokenIndex.IdxBuckets,
      "the index is a sparse presence set, not a dense cross product")
    // soundness: the pruned lookup equals the same lookup over ALL shards
    val got = TokenIndex.probedLookup(spark, sf).collect().map(_.toSeq)
    val full = {
      val docs = Tables.documents(spark, sf)
      val grams = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(toks) - 3), " +
            "i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2]))")).as("gram"))
        .distinct()
      val rare = grams.groupBy("gram").agg(count(lit(1)).as("df"))
        .filter(col("df") === 1).orderBy("gram").limit(TokenIndex.NProbes)
        .select("gram")
      grams.join(rare, "gram")
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .select(col("gram"), col("doc_id"), col("source"))
        .orderBy("gram", "doc_id").collect().map(_.toSeq)
    }
    assert(got.toSeq == full.toSeq, "pruned lookup must equal the full-scan lookup")
  }

  test("q131: the numbering window is partitioned — never a corpus-wide single-partition sort") {
    val p = plan(graft.ext.Curation.globalRowNumbers(Tables.documents(spark, sf)))
    val i = p.indexOf("row_number()")
    assert(i >= 0 &&
      p.substring(i, math.min(p.length, i + 120)).contains("windowspecdefinition(gbucket"),
      s"rn must be computed per bucket, not over a global order:\n${p.substring(math.max(0, i - 50), math.min(p.length, i + 200))}")
    // the tiny offset/stat relations broadcast back to the corpus side
    assert(p.contains("BroadcastHashJoin"),
      "bucket offsets must join as broadcasts, not shuffles")
  }

  test("q191: both interleave phases rank inside partitioned windows, offsets broadcast") {
    val p = plan(graft.ext.Curation.sourceInterleave(Tables.documents(spark, sf)))
    // every corpus-side row_number must sit in a PARTITIONED window —
    // phase 1 over (source, key-bucket), phase 2 over the rank bucket;
    // a windowspecdefinition starting with the order column alone would
    // be the Exchange(SinglePartition) funnel the rewrite deletes
    var i = p.indexOf("row_number()")
    var found = 0
    while (i >= 0) {
      val w = p.substring(i, math.min(p.length, i + 160))
      assert(w.contains("windowspecdefinition(source") ||
             w.contains("windowspecdefinition(gb"),
        s"interleave rank must be bucket-partitioned:\n$w")
      found += 1
      i = p.indexOf("row_number()", i + 1)
    }
    assert(found >= 2, "both phases rank through windows")
    assert(p.contains("BroadcastHashJoin"),
      "bucket offsets must join as broadcasts, not shuffles")
  }

  test("q190: winnowing pair join is an equi-join; selection is generator-free projection") {
    val p = plan(graft.ext.Dedup.winnowedPairs(Tables.documents(spark, sf)))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "fingerprint postings must join on the fp key only")
    // per-doc selection stays inside projections: every generator in
    // the plan is the final per-doc DISTINCT-fingerprint unnest (the
    // subtree prints once per self-join branch) — never per-window or
    // per-gram rows
    val gens = "Generate explode\\([^)]*".r.findAllIn(p).toSeq
    assert(gens.nonEmpty && gens.forall(_.contains("array_distinct")),
      s"the only explode is the distinct-fp unnest, got: ${gens.headOption}")
  }

  test("q210: attribution windows are RANGE frames over the user partition") {
    val p = plan(graft.queries.Relational.q210Attribution(spark, TestSpark.sf))
    assert(p.contains("specifiedwindowframe(RangeFrame"),
      "the lookback must be a RANGE frame, not a ROWS approximation")
    assert(p.contains("windowspecdefinition(user_id"),
      "attribution state is per-user, never global")
    // the one-row t0 scalar cross-joins as a broadcast BNLJ (the house
    // scalar pattern, cf. q133); what must NOT appear is a cartesian
    assert(!p.contains("CartesianProduct"),
      "touch-type resolution joins on event_id only")
  }

  test("q133: threshold relation broadcasts; stage assignment is stateless per row") {
    val p = plan(graft.ext.TextAnalysis.curriculumBuckets(Tables.documents(spark, sf)))
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the 1-row threshold table must cross-join as a broadcast")
    assert(!p.contains("CartesianProduct"),
      "no cartesian product anywhere in the curriculum plan")
  }

  test("q172: the sweep's running sum is partitioned by day — only the day-total relation sees a global window") {
    val p = plan(graft.queries.Relational.q172PeakConcurrency(spark, sf))
    val i = p.indexOf("sum(delta")
    assert(i >= 0 &&
      p.substring(i, math.min(p.length, i + 160)).contains("windowspecdefinition(day"),
      s"the delta-level cumulative sum must run per day bucket:\n${p.substring(math.max(0, i - 50), math.min(p.length, i + 220))}")
    assert(p.contains("BroadcastHashJoin"),
      "day carry-in offsets must join back as a broadcast")
  }

  test("q178: the crashed commit is invisible until its atomic rename; both tables flip together") {
    import graft.sources.Compaction
    // gate call rebuilds the store with txn 3 crashed mid-commit
    Compaction.txnSummary(spark, sf).collect()
    val root = Compaction.txnRoot(spark, sf)
    assert(Compaction.txnPublished(root) == Seq(1L, 2L))
    // the crashed txn's DATA is fully on disk, yet unpublished
    assert(java.nio.file.Files.isDirectory(root.resolve("t3").resolve("docs")))
    assert(java.nio.file.Files.isDirectory(root.resolve("t3").resolve("stats")))
    assert(java.nio.file.Files.exists(root.resolve("manifests").resolve(".tmp-m3")))
    assert(!java.nio.file.Files.exists(root.resolve("manifests").resolve("m3")))
    // complete the crash with the SAME atomic rename: both tables flip at once
    Compaction.txnCommit(root, 3)
    assert(Compaction.txnPublished(root) == Seq(1L, 2L, 3L))
    val t3 = root.resolve("t3")
    val docs3 = spark.read.parquet(t3.resolve("docs").toString)
    val stats3 = spark.read.parquet(t3.resolve("stats").toString)
    // cross-table consistency of the newly visible snapshot: the stats
    // table equals a recompute from the docs table it committed with
    val recomputed = docs3.groupBy("source")
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("n_docs"),
        org.apache.spark.sql.functions.sum(col("n_chars")).as("char_sum"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val stored = stats3.collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_docs"), r.getAs[Long]("char_sum"))).toMap
    assert(stored == recomputed, "stats and docs are one snapshot")
    // and the next gate call replants the crash (rebuild honesty)
    Compaction.txnSummary(spark, sf).collect()
    assert(Compaction.txnPublished(Compaction.txnRoot(spark, sf)) == Seq(1L, 2L))
  }

  test("q188: no cartesian product; candidates verify through equi-joins only") {
    // the checkpoint-heavy plan renders in lazy AQE form (ExistingRDD
    // leaves, no codegen markers), so the guard pins the join SHAPES:
    // every join in the similarity pipeline must be an equi-join —
    // a cartesian or nested-loop anywhere is the O(n²) failure this
    // operator exists to avoid
    val p = plan(graft.ext.Dedup.ppjoinPairs(Tables.documents(spark, sf)))
    assert(!p.contains("CartesianProduct"),
      "the similarity join must never plan a cartesian product")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "prefix postings and verification joins are all equi-joins")
  }

  test("q128: only selected-bucket rows reach the selection window") {
    val df = graft.ext.TextAnalysis.exactQuantiles(Tables.documents(spark, sf))
    val p = plan(df)
    // the corpus-side scan reads exactly the two columns selection needs
    assert(p.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"),
      "pass-2 scan must prune to (doc_id, n_chars)")
    // the window's input is the bucket join's output, not the corpus:
    // the target-bucket side broadcasts and the join sits below the
    // p_permille exchange feeding the row_number window
    val win = p.indexOf("Window")
    assert(win >= 0 && p.indexOf("BroadcastHashJoin", win) > 0,
      "bucket pruning must happen before the selection window")
  }

  // ------------------------------------------------- round-9 additions

  test("q215: phrases and terms broadcast; adjacency never self-joins the raw corpus") {
    val p = plan(graft.ext.TextAnalysis.phraseSearch(Tables.documents(spark, sf)))
    assert(p.contains("BroadcastHashJoin"),
      "the query-term prune and phrase joins must broadcast the model side")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "positional adjacency is pure equi-join arithmetic")
  }

  test("q216: one Window operator computes every SNM lead; no pair self-join exists") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = plan(graft.ext.Dedup.sortedNeighborhoodPairs(Tables.documents(spark, sf)))
      val windows = p.linesIterator.count(_.contains("Window ["))
      assert(windows == 1,
        s"all ${graft.ext.Dedup.SnmWindow} leads must share one window pass, saw $windows")
      assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
        "SNM generates candidates by sorting, never by joining")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q217: needles broadcast against the one-pass rolling-hash scan") {
    val p = plan(graft.ext.Dedup.canaryScan(Tables.documents(spark, sf)))
    assert(p.contains("rolling_hashes"),
      "the corpus side must scan through the O(n) Rabin-Karp kernel")
    assert(p.contains("BroadcastHashJoin"), "the needle table must broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "multi-pattern search must not plan the O(corpus x needles) loop")
  }

  test("q222/q224: PQ training and knn vote never plan a cartesian product; model sides broadcast") {
    val p1 = plan(graft.ext.Similarity.pqTrainStep(Tables.embeddings(spark, sf)))
    assert(!p1.contains("CartesianProduct"))
    assert(p1.contains("BroadcastHashJoin"),
      "the codebook and assignment joins must broadcast the model side")
    val p2 = plan(graft.ext.Similarity.knnLabelVote(Tables.embeddings(spark, sf)))
    assert(!p2.contains("CartesianProduct"))
    assert(p2.contains("BroadcastHashJoin"),
      "the neighbor-label lookup must broadcast the |Q|*k side")
  }

  test("q223: one corpus token aggregate feeds both the cutoff and the rate; membership broadcasts") {
    val p = plan(graft.ext.TextAnalysis.oovRate(Tables.documents(spark, sf)))
    assert(p.contains("TakeOrderedAndProject"),
      "the top-V cutoff must plan as TakeOrdered over the vocab aggregate, not a global sort")
    assert(p.contains("BroadcastHashJoin"), "vocab membership must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q220: the extrapolation side reads metadata only — text stays pruned to the sample scan") {
    val p = plan(graft.ext.Sketches.tokenCostEstimate(Tables.documents(spark, sf)))
    val scans = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(scans.exists(!_.contains("text")),
      s"the full-corpus side must scan (source, n_chars) without text:\n${scans.mkString("\n")}")
  }

  test("q225/q226: the reference model broadcasts; the KN report plans as TakeOrdered") {
    // the scored relation (pre-checkpoint): model joins broadcast, and
    // the corpus-sized apply stream exchanges on doc_id exactly once
    val p0 = plan(graft.ext.Lm.pplScored(Tables.documents(spark, sf)))
    assert(!p0.contains("CartesianProduct"))
    assert(p0.contains("BroadcastHashJoin"),
      "the reference gram/unigram model joins must broadcast onto the apply stream")
    assert(p0.linesIterator.count(l =>
      l.contains("hashpartitioning(doc_id") && l.contains("Exchange")) <= 1,
      "the apply bigram stream must shuffle on doc_id exactly once")
    val p1 = plan(graft.ext.Lm.perplexityFilter(Tables.documents(spark, sf)))
    assert(!p1.contains("CartesianProduct"))
    val p2 = plan(graft.ext.Lm.knBigram(Tables.documents(spark, sf)))
    assert(!p2.contains("CartesianProduct"))
    assert(p2.contains("TakeOrderedAndProject"),
      "the top-K KN report must never plan a global sort")
  }

  test("q227/q228: threshold and histogram windows run over bounded aggregates, not the corpus") {
    val p1 = plan(graft.ext.Curation.conformalGate(Tables.documents(spark, sf)))
    assert(!p1.contains("CartesianProduct"))
    // the only Window sits above the score value-counts HashAggregate
    assert(p1.contains("Window") && p1.contains("HashAggregate"),
      "the order statistic must come from the value-counts cumsum")
    val p2 = plan(graft.ext.Sketches.histQuantiles(Tables.documents(spark, sf)))
    assert(!p2.contains("CartesianProduct"))
    assert(p2.linesIterator.exists(l =>
      l.contains("Window") && !l.contains("SortMergeJoin")),
      "per-source cumsum window must be present")
  }

  test("q232/q233: the position set and eval fps broadcast; the RLE window is split-partitioned") {
    val p1 = plan(graft.ext.Dedup.bloomFprAudit(Tables.documents(spark, sf)))
    assert(!p1.contains("CartesianProduct"))
    assert(p1.contains("BroadcastHashJoin"),
      "the eval position-set and fingerprint joins must broadcast")
    val p2 = plan(graft.ext.Curation.manifestRle(Tables.documents(spark, sf)))
    assert(!p2.contains("CartesianProduct"))
    assert(p2.linesIterator.exists(l =>
      l.contains("Window") && l.contains("source")),
      "the island window must partition by (source, split), never globally")
  }

  test("q234: the rank window partitions by source; the sample side alone reads text") {
    val p = plan(graft.ext.Sketches.stratifiedTokenEstimate(Tables.documents(spark, sf)))
    assert(!p.contains("CartesianProduct"))
    assert(p.linesIterator.exists(l =>
      l.contains("Window") && l.contains("source")),
      "the stratification rank must partition by source, never globally")
    val scans = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(scans.exists(!_.contains("text")),
      s"the full-corpus side must stay metadata-only:\n${scans.mkString("\n")}")
  }

  test("q230/q231: energy frames fan out partition-local; head ranking runs over the vocab aggregate") {
    val p1 = plan(graft.ext.Multimodal.audioEnergy(Tables.documents(spark, sf)))
    assert(!p1.contains("CartesianProduct"))
    assert(p1.linesIterator.count(l =>
      l.contains("hashpartitioning(doc_id") && l.contains("Exchange")) <= 1,
      "frame explode must stay partition-local; one doc_id exchange serves threshold + rollup")
    val p2 = plan(graft.ext.TextAnalysis.headMass(Tables.documents(spark, sf)))
    assert(!p2.contains("CartesianProduct"))
    assert(p2.contains("Window") && p2.contains("HashAggregate"),
      "the rank window must sit above the (source, token) aggregate")
  }

  test("q229: the stride relation broadcasts; the cumsum window is source-partitioned") {
    val p = plan(graft.ext.Mixture.systematicSample(Tables.documents(spark, sf)))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"),
      "the |sources|-row stride relation must broadcast")
    assert(p.linesIterator.exists(l =>
      l.contains("Window") && l.contains("source")),
      "the running-mass window must partition by source, never globally")
  }

  test("every unpartitioned window is enumerated — none can silently re-point at the corpus") {
    // A Window with no partitionSpec moves ALL its input to a single
    // partition (the WindowExec warning the logs show); that is
    // legitimate ONLY over provably bounded relations — vocab tops,
    // bucket/histogram registers, |sources|-row plan tables. This test
    // walks every registered query's optimized logical plan and pins
    // the EXACT set of queries allowed to contain one, with the bounded
    // relation named: re-pointing a global window at the corpus (or
    // adding a new one) fails here instead of shipping a
    // single-partition sort to a 100 TB run. (Windows hidden below a
    // lazy localCheckpoint are enumerated by their OWN query's plan at
    // build time; the checkpoint consumers see a leaf.)
    val allowed: Map[String, String] = Map( // name -> the bounded relation
      // q113/q114/q200/q201 left this set in r16: bpeEncode's dense-id
      // numbering no longer uses a window at all (the vocab-sized
      // distinct is ordered by Spark and collected, ids attach as a
      // broadcast map lookup)
      "q128_exact_quantiles" -> "selected-bucket histogram registers (<= 2^shift rows; asserted above)",
      "q131_global_rownum" -> "per-partition count/offset relation (#partitions rows; corpus window asserted partitioned above)",
      "q133_curriculum" -> "score-bucket histogram (two windows over the tiny sorted register)",
      "q143_bm25" -> "query-term slice (model-sized)",
      "q163_pareto_frontier" -> "per-source aggregate (|sources| rows)",
      "q172_peak_concurrency" -> "day-total relation (asserted above: only it sees a global window)",
      "q180_water_filling" -> "k-row source-allocation algebra",
      "q181_retrieval_eval" -> "eval query set (model-sized)",
      "q191_interleave" -> "per-source offset table (asserted above: phases rank partitioned)",
      "q195_rank_fusion" -> "fused top-k retrieval lists (TakeOrdered cuts)",
      "q197_hard_negatives" -> "top-k candidate cuts over the q143 pass",
      "q203_vocab_growth" -> "vocab growth-curve register (bucketed vocab aggregate)",
      "q211_cascade_rerank" -> "retrieve-stage top-k lists",
      "q213_split_leakage" -> "banded-pair probe relation (capped pair graph slice)",
      "q225_perplexity_filter" -> "bounded value-counts tertile register",
      "q227_conformal_gate" -> "calibration-split aggregate (loud raise_error on small n)",
      "q63_domain_mix" -> "per-domain quota table (|domains| rows)")
    val found = scala.collection.mutable.SortedMap.empty[String, Int]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val df = fn(spark, sf)
      val n = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
        case w: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit
          if w.partitionSpec.isEmpty => w
      }.size
      if (n > 0) found(name) = n
    }
    assert(found.keySet == allowed.keySet,
      s"unpartitioned windows drifted — new (audit the relation's bound, " +
        s"then enumerate): ${found.keySet -- allowed.keySet}; " +
        s"stale allowlist entries: ${allowed.keySet -- found.keySet}; " +
        s"counts: $found")
  }
}
