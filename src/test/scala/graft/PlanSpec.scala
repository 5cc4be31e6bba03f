package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: each headline query must keep the
  * plan shape that makes it scale — pushdown reaching the parquet scan,
  * pruned read schemas, broadcasts on dim joins, WindowGroupLimit on
  * rank-filters, TakeOrderedAndProject on sort+limit. A silent plan
  * regression (e.g. a filter that stops pushing) costs orders of
  * magnitude at 100 TB while every correctness test stays green —
  * that's why these are asserted, not just eyeballed. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q_asof_nearest: both directional window carries share ONE key " +
      "hash exchange (opposite tie orders cost a sort, never a shuffle)") {
    val p = plan("q_asof_nearest")
    // 1 hash exchange for the union+window; the orderBy adds range
    // exchanges only
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"expected exactly one key hash exchange:\n$p")
    assert("Window ".r.findAllIn(p).length >= 2)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"nearest as-of must not plan a join:\n$p")
  }

  test("q1_agg: shipdate filter pushes to the scan; schema pruned to 6 cols") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    val read = p.split("ReadSchema: ")(1)
    assert(!read.contains("l_orderkey") && !read.contains("l_comment"))
    assert(read.contains("l_quantity") && read.contains("l_returnflag"))
  }

  test("q3_join_star: dims broadcast, no shuffle join on small sides") {
    val p = plan("q3_join_star")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("w1_dedup_latest + q_topk_per_group: rank filter becomes WindowGroupLimit") {
    assert(plan("w1_dedup_latest").contains("WindowGroupLimit"))
    assert(plan("q_topk_per_group").contains("WindowGroupLimit"))
  }

  test("q_funnel_sliding: ONE user exchange feeds both window passes AND " +
      "the per-user depth aggregate; step filter pushes to the scan") {
    val p = plan("q_funnel_sliding")
    // the recurrence is two Window operators + the depth agg sharing the
    // single hashpartitioning(user) exchange (the orderBy adds one range
    // exchange); a second hash exchange means the reuse regressed
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"expected exactly one user hash exchange:\n$p")
    assert("Window ".r.findAllIn(p).length >= 2)
    assert(p.contains("In(event_type"), s"step filter not pushed:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_event_paths: the first-N prune is a WindowGroupLimit on BOTH " +
      "sides of the user exchange (map partitions ship <= N rows/user)") {
    val p = plan("q_event_paths")
    assert("WindowGroupLimit".r.findAllIn(p).length >= 2,
      s"row_number prune lost its map-side WindowGroupLimit:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_funnel + q_dsir_weights: model/frontier joins never fall to a " +
      "cartesian; dsir's B-row distribution tables broadcast") {
    val pf = plan("q_funnel")
    assert(!pf.contains("CartesianProduct"))
    val pd = plan("q_dsir_weights")
    assert(pd.contains("BroadcastHashJoin"), s"dsir model join not broadcast:\n$pd")
    assert(!pd.contains("SortMergeJoin") && !pd.contains("CartesianProduct"))
  }

  test("q_domain_cap: per-domain rank bounded map-side (WindowGroupLimit)") {
    assert(plan("q_domain_cap").contains("WindowGroupLimit"))
  }

  test("q_sort_limit: global sort+limit is TakeOrderedAndProject, not a full sort") {
    val p = plan("q_sort_limit")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q_join_anti: orderdate predicate pushed into the orders scan") {
    val p = plan("q_join_anti")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"))
  }

  test("q_minhash_neardup: banding joins hash-based, no nested loop") {
    val p = plan("q_minhash_neardup")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"))
  }

  test("q_range_join: user_id equi-anchor keeps it a hash/merge join") {
    val p = plan("q_range_join")
    assert(p.contains("Join") &&
      (p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_session_gap: one data shuffle feeds both windows AND the aggregate") {
    // lag-window, running-sum window, and groupBy(user_id, session_id)
    // must all ride the single hashpartitioning(user_id) exchange — the
    // aggregate's required clustering is satisfied by the superset-free
    // user_id partitioning, so sessionization at scale = scan + ONE
    // shuffle (+ the output sort)
    val p = plan("q_session_gap")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 hash exchange, plan:\n$p")
  }

  test("jaccard/lsh top-k: candidate joins stay hash-based after rewrites") {
    Seq("q_ngram_jaccard", "q_lsh_topk").foreach { q =>
      val p = plan(q)
      assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
        s"$q plan degenerated:\n$p")
    }
  }

  test("semDedup: the in-cell pair join keys on (cell, block, block), " +
      "never the bare ~nlist-value cell") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import graft.similarity.SimilarityOps
    // the final query plan hides the pair join (ConnectedComponents is
    // eager), so assert on the lazy pair frame the operator builds
    val emb = analytics.Tables(spark, dir, "embeddings")
    val pairs = SimilarityOps.semDedupPairsOf(
      SimilarityOps.semDedupAssign(emb, nlist = 16), 0.4, blocks = 8)
    // a cell-only join would put each cell's n^2/2 compares on one task
    val joinKeyCounts = pairs.queryExecution.optimizedPlan.collect {
      case j: Join if j.condition.isDefined =>
        j.condition.get.references.map(_.name).toSeq
          .count(n => n == "bi" || n == "bj" || n == "cell")
    }
    assert(joinKeyCounts.exists(_ >= 3),
      s"expected a (cell, bi, bj)-keyed pair join; key hits: $joinKeyCounts")
    val p = pairs.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"pair join degenerated:\n$p")
  }

  test("q_embed_neardup: block-partitioned all-pairs is an equi-join — " +
      "no CartesianProduct, no nested loop") {
    val p = plan("q_embed_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"q_embed_neardup plan degenerated:\n$p")
    // at sf0.001 the exploded side is small enough to broadcast; any
    // hash-keyed equi-join shape on (bi, bj) is the scale-correct plan
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"),
      s"expected an equi-join on the block-pair key:\n$p")
  }

  test("q_pack: the data-sized window is shard-partitioned; only the " +
      "32-row aggregate rides a single partition") {
    val p = plan("q_pack")
    // the running-sum window over documents must be keyed by shard …
    assert(p.contains("Window") &&
      "windowspecdefinition\\(shard".r.findFirstIn(p).isDefined,
      s"expected shard-partitioned window:\n$p")
    // … and the per-shard offsets (constant 32 rows) come back via a
    // broadcast, never a re-shuffle of the data
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast offsets:\n$p")
    // the only SinglePartition exchange feeds the aggregate-row window,
    // which must sit ABOVE a HashAggregate (i.e. it sees 32 rows, not data)
    val single = "Exchange SinglePartition".r.findAllIn(p).length
    assert(single <= 1, s"expected at most one single-partition exchange:\n$p")
  }

  test("q_winnow_fp: fused kernel — zero shuffles before the output sort") {
    val p = plan("q_winnow_fp")
    // winnowing is per-document local compute in one kernel: no window
    // exchange, no distinct exchange — the only Exchange allowed is the
    // declared ORDER BY's range partitioning
    assert(!p.contains("Window "), s"expected no WindowExec:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"expected no hash exchange (fused per-doc kernel):\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"))
  }

  test("q_substr_dedup: gram window + coverage joins stay hash-based — " +
      "no CartesianProduct, no nested loop") {
    val p = plan("q_substr_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"substring dedup went quadratic:\n$p")
  }

  test("q_image_decode: metadata-only media queries prune the binaryFile content column") {
    // the declared query needs the bytes; a metadata projection must NOT
    // read them — binaryFile supports content pruning and a 100 TB media
    // crawl depends on it
    val meta = graft.multimodal.Multimodal
      .readMedia(spark, s"${MultimodalQueries.mediaRoot}/img", "*.png")
      .select("path", "length")
    val read = meta.queryExecution.executedPlan.toString.split("ReadSchema: ")(1)
    assert(!read.contains("content"), s"content not pruned:\n$read")
  }

  test("q_stratified_sample: the data-sized rank window is sharded, not per-stratum") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val q = SparkEntry.queries("q_stratified_sample")(spark, dir)
    val rankWindows = q.queryExecution.optimizedPlan.collect {
      case w: LWindow
        if w.windowExpressions.exists(_.toString.contains("row_number")) => w
    }
    assert(rankWindows.nonEmpty)
    // partition spec must be (stratum, shard) — a stratum-only window
    // serializes each language onto one task at corpus scale
    rankWindows.foreach(w => assert(w.partitionSpec.size == 2,
      s"rank window must shard beyond the stratum: ${w.partitionSpec}"))
  }

  test("q_token_budget/q_upsample: data-sized windows are sharded, not per-stratum") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    for (name <- Seq("q_token_budget", "q_upsample")) {
      val q = SparkEntry.queries(name)(spark, dir)
      // the running-sum / rank window over the data must key on
      // (stratum, shard); only the 256-row-per-stratum offset windows may
      // key on the stratum alone
      val allWindows = q.queryExecution.optimizedPlan.collect {
        case w: LWindow => w
      }
      val sharded = allWindows.filter(_.partitionSpec.size == 2)
      assert(allWindows.nonEmpty, s"$name: expected window operators")
      assert(sharded.nonEmpty,
        s"$name: the data-sized window must shard beyond the stratum")
    }
  }

  test("broadcast-cross queries: every nested loop is broadcast-bounded, never Cartesian") {
    // contamination / brute-force top-k / IVF assignment intentionally
    // cross a streamed corpus with a BROADCAST small side (probes,
    // centroids): per-row fan-out is bounded by the broadcast size, so
    // the scan stays linear in the corpus — the scale dimension. What
    // must never appear is the unbounded data-x-data form.
    Seq("q_contamination", "q_cosine_topk", "q_ivf_topk",
        "q_sq8_topk", "q_pq_topk").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q went Cartesian:\n$p")
      assert(p.contains("BroadcastNestedLoopJoin") || !p.contains("NestedLoop"),
        s"$q has a non-broadcast nested loop:\n$p")
    }
    // the quantized/ADC brute forms keep the rank-k map-side bound
    Seq("q_sq8_topk", "q_pq_topk").foreach { q =>
      assert(plan(q).contains("WindowGroupLimit"), s"$q rank not thinned")
    }
  }

  test("q_scd2: lag + lead windows share ONE hash exchange and one sort") {
    // change detection (lag) and interval close (lead) partition and
    // order identically; the filter between them preserves both, so the
    // second WindowExec must not add an exchange or a sort
    val p = plan("q_scd2")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 hash exchange, plan:\n$p")
    // exactly one (user_id, ts_us, ...) window sort — the output orderBy
    // sorts on (user_id, valid_from, ...) and is counted separately
    val windowSorts = "Sort \\[user_id[^\\]]*ts_us".r.findAllIn(p).length
    assert(windowSorts == 1, s"second window re-sorted, plan:\n$p")
  }

  test("q_scd2_join: equi-anchored interval join stays hash-based") {
    val p = plan("q_scd2_join")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"temporal join degenerated:\n$p")
  }

  test("q_interpolate: forward and backward frames share ONE hash " +
    "exchange and one window sort") {
    val p = plan("q_interpolate")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 hash exchange, plan:\n$p")
    val windowSorts = "Sort \\[user_id[^\\]]*ts_us".r.findAllIn(p).length
    assert(windowSorts == 1, s"backward frame re-sorted, plan:\n$p")
  }

  test("q_line_dedup/q_boilerplate: keep-first window thins via " +
    "WindowGroupLimit; all joins hash-based") {
    val p = plan("q_line_dedup")
    assert(p.contains("WindowGroupLimit"), s"rank-1 not thinned:\n$p")
    Seq("q_line_dedup", "q_boilerplate").foreach { q =>
      val pl = plan(q)
      assert(!pl.contains("CartesianProduct") && !pl.contains("NestedLoop"),
        s"$q degenerated:\n$pl")
    }
  }

  test("q_interval_join: bucketized overlap join stays hash-based — " +
    "no CartesianProduct, no nested loop") {
    val p = plan("q_interval_join")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"interval join degenerated:\n$p")
  }

  test("q_salted_join: join keys include the salt column") {
    val p = plan("q_salted_join")
    assert(p.contains("_salt"), s"salt column not in the plan:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_robust_z: both per-stratum stat joins broadcast — data never " +
      "shuffles on the stratum key") {
    val p = plan("q_robust_z")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"expected 2 broadcast joins:\n$p")
    // the only hash exchanges allowed are the two tiny stat aggregates'
    // (one row per stratum), never a data-sized stratum repartition
    assert(!p.contains("SortMergeJoin"), s"stat join fell to SMJ:\n$p")
  }

  test("sketch builds: HLL/KLL/CMS aggregates are map-side combined " +
      "(partial before the exchange)") {
    for (q <- Seq("q_hll_rollup", "q_kll_profile")) {
      val p = plan(q)
      // partial_ aggregate modes upstream of the exchange = map-side
      // combine: each task ships one sketch per local stratum, not rows
      assert(p.contains("partial_"), s"$q lost map-side combine:\n$p")
      assert(!p.contains("CartesianProduct"))
    }
    // the CMS build is a single global sketch: one partial per partition
    // merged once — the scoring pass must stay join-free (map-only probe).
    // The declared query scores through the engine-portable CMS (its
    // oracle promotion); either probe expression satisfies the contract.
    val cms = plan("q_cms_frequent_ratio")
    assert(cms.contains("portable_cms_estimate") ||
        cms.contains("cms_estimate_long"),
      s"sketch probe not inlined in the plan:\n$cms")
  }

  test("bronze/silver pipeline: silver plan has exactly one hash exchange for dedup") {
    // the silver frame (read -> window -> filters) must shuffle ONCE (on
    // the PK window); extra exchanges mean a plan regression
    import spark.implicits._
    val df = Seq((1L, "a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "v", "_ingested_at")
    val deduped = graft.ops.Dedup.latestByIngestion(df, Seq("id"))
    val p = deduped.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 shuffle, plan:\n$p")
  }

  test("q_weighted_sample: both A-ES selection windows are " +
      "WindowGroupLimit-bounded and the data-sized one is sharded") {
    val p = plan("q_weighted_sample")
    // two rank<=k windows -> two WindowGroupLimit spans (bounded heaps,
    // never a full per-stratum sort of the corpus)
    val limits = "WindowGroupLimit".r.findAllIn(p).length
    assert(limits >= 2, s"expected 2 WindowGroupLimit spans:\n$p")
    // stage-1 window partitions on (stratum, shard), not stratum alone
    assert(p.contains("_shard"), s"stage-1 window lost its shard key:\n$p")
  }

  test("q_bm25_topk: query terms broadcast; both rank windows are " +
      "WindowGroupLimit-bounded and the data-sized one is hash-sharded, " +
      "never keyed on the low-cardinality query id alone") {
    val p = plan("q_bm25_topk")
    assert(p.contains("BroadcastHashJoin"), s"query-term join lost its " +
      s"broadcast:\n$p")
    val limits = "WindowGroupLimit".r.findAllIn(p).length
    assert(limits >= 2, s"expected 2 WindowGroupLimit spans:\n$p")
    // stage-1 window partitions on (query, shard): a two-key group limit
    // must exist (the shard expression is projected to a _w attribute)
    val twoKey = """WindowGroupLimit \[[^\],]+, [^\]]+\]""".r
    assert(twoKey.findFirstIn(p).nonEmpty,
      s"stage-1 window lost its shard key:\n$p")
  }

  test("q_quality_topfrac: the per-source percentile gate range-exchanges " +
      "on (source, score) — no data-sized window keyed on the " +
      "low-cardinality source alone") {
    // the declared query materializes the ranked frame (its final plan
    // roots at the checkpoint), so assert the rank machinery's shape on
    // an unmaterialized twin: same group key, score-ordered
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = graft.ops.Rank.groupedRank(docs, Seq("source"),
        Seq(col("n_chars").desc, col("doc_id").asc), "rk",
        materialize = false)
      .queryExecution.executedPlan.toString
    assert(p.contains("rangepartitioning"),
      s"lost the range exchange on (group, score):\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"unexpected single-partition stage:\n$p")
  }

  test("q_exact_percentile: wanted-ranks table broadcasts back; no " +
      "single-partition stage and no per-group sort through one task") {
    val p = plan("q_exact_percentile")
    assert(p.contains("BroadcastHashJoin"),
      s"wanted-ranks join lost its broadcast:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"unexpected single-partition stage:\n$p")
    // the only windows run over the driver-scale needs/offsets frames;
    // a WindowExec whose partition spec is the bare group key over the
    // ranked corpus would resurrect the per-group sort
    assert(!p.contains("WindowGroupLimit"), // selection is join-based
      s"unexpected group-limit window:\n$p")
  }

  test("q_rank_family: no data-sized window keys on the 5-value segment " +
      "— the corpus range-exchanges on (segment, acctbal) and bucket " +
      "ranks broadcast back") {
    val p = plan("q_rank_family")
    // the groupedRank stage is checkpointed (its range-exchange shape is
    // pinned by RankSpec); here: bucket ranks broadcast back, no window
    // ntile, and no single-partition stage anywhere
    assert(p.contains("BroadcastHashJoin"),
      s"bucket-rank join lost its broadcast:\n$p")
    assert(!p.contains("ntile"), s"a window ntile reappeared:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"unexpected single-partition stage:\n$p")
  }

  test("runtime bloom-filter join pruning: a selective dim filter injects " +
      "a bloom probe into the fact scan side (the 100 TB shuffle-join " +
      "reducer; thresholds lowered to make it observable at test scale)") {
    // At 100 TB the conf posture is the DEFAULT thresholds (creation side
    // <= 10 MB, application side >= 10 GB); here both thresholds collapse
    // so the injection is assertable on sf0.001. Broadcast is disabled
    // because InjectRuntimeFilter targets shuffle joins (a broadcast
    // join already prunes via the hash relation).
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" ->
        "1GB",
      "spark.sql.optimizer.runtime.bloomFilter." +
        "applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions._
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val ord = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy(col("o_orderpriority")).count()
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        s"no runtime bloom filter injected:\n$opt")
      // and it still computes the right thing with the filter in place
      assert(joined.collect().map(_.getLong(1)).sum > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("wave-7 queries: narrow projections stay shuffle-bounded — " +
      "no cartesian/nested-loop anywhere; hashing-tf is one hash " +
      "aggregate pair; winsorize bounds join is broadcast") {
    Seq("q_unicode_nfc", "q_hashing_tf", "q_l2_normalize", "q_skew_report",
        "q_winsorize").foreach { q =>
      val pl = plan(q)
      assert(!pl.contains("CartesianProduct"), s"$q went Cartesian:\n$pl")
      // a 1-row scalar riding a BROADCAST nested loop is the intended
      // corpus-scalar pattern; any other nested loop is a degeneration
      assert(pl.contains("BroadcastNestedLoopJoin") || !pl.contains("NestedLoop"),
        s"$q has a non-broadcast nested loop:\n$pl")
    }
    // per-(doc, bucket) aggregate: exactly one data-sized hash exchange
    // (partial/final HashAggregate around it)
    val htf = plan("q_hashing_tf")
    assert("Exchange hashpartitioning".r.findAllIn(htf).length == 1,
      s"hashing-tf grew extra exchanges:\n$htf")
    // skew report: the head is TakeOrdered, never a global sort of counts
    assert(plan("q_skew_report").contains("TakeOrderedAndProject"))
    // winsorize: the per-stratum bounds come back via broadcast — the
    // data-sized side never shuffles on the stratum key for the clamp
    val win = plan("q_winsorize")
    assert(win.contains("BroadcastHashJoin"), s"bounds join not broadcast:\n$win")
  }

  test("round-8 analytics: OLS one aggregate, Cramér broadcast marginals, " +
      "gini/auc single rank exchange, no cartesian anywhere") {
    // grouped OLS: exactly one data-sized hash exchange (the partial/
    // final aggregate pair) — power sums never re-shuffle
    val ols = plan("q_ols_group")
    assert("Exchange hashpartitioning".r.findAllIn(ols).length == 1,
      s"OLS grew extra exchanges:\n$ols")
    // Cramér's V: the marginal/total joins ride broadcasts, the data
    // shuffles only into the (x, y) cell aggregate
    val cv = plan("q_cramers_v")
    assert(cv.contains("BroadcastHashJoin") ||
      cv.contains("BroadcastNestedLoopJoin"),
      s"cramersV marginals not broadcast:\n$cv")
    assert(!cv.contains("CartesianProduct"), s"cartesian in cramersV:\n$cv")
    // gini / auc: the rank window needs ONE range exchange on the group;
    // the aggregate reuses the windowed partitioning (no second
    // data-sized hash exchange on the same key)
    for (q <- Seq("q_gini", "q_auc")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"cartesian in $q:\n$p")
      assert("Exchange rangepartitioning".r.findAllIn(p).length <= 1,
        s"$q re-sorts more than once:\n$p")
    }
    // triangles: every join hash-based (the wedge join + closing
    // semi-join must never degrade to a nested loop)
    val tri = plan("q_triangles")
    assert(!tri.contains("CartesianProduct") &&
      !tri.contains("BroadcastNestedLoopJoin"),
      s"triangle joins degraded:\n$tri")
    // calibration: one hash aggregate over the bin key
    val cal = plan("q_calibration")
    assert(!cal.contains("CartesianProduct"))
  }

  test("round-10 shapes: item-sim top-k prunes map-side, MRR windows " +
      "key per query, concurrency keeps PrefixSum's bounded " +
      "single-partition step") {
    // item-sim: the rank<=k filter must stay a Partial+Final
    // WindowGroupLimit pair around ONE item-keyed exchange — each map
    // partition forwards at most k rows per item
    val sim = plan("q_item_sim")
    assert("WindowGroupLimit".r.findAllIn(sim).length == 2,
      s"item-sim lost the partial group-limit prune:\n$sim")
    assert(!sim.contains("CartesianProduct"))
    // MRR: the ranking window partitions by (variant, user) — a
    // data-sized ranking must never collapse to a global window
    val mrr = plan("q_mrr")
    assert("windowspecdefinition\\(variant#\\d+L?, user_id#\\d+L?,".r
      .findAllIn(mrr).nonEmpty,
      s"MRR window no longer keys per (variant, user):\n$mrr")
    assert(!mrr.contains("CartesianProduct"))
    // concurrency: PrefixSum's only single-partition step is the
    // partition-count-sized offsets table, broadcast back — the
    // boundary stream itself never funnels through one task
    val conc = plan("q_concurrency")
    assert("Exchange SinglePartition".r.findAllIn(conc).length <= 1,
      s"concurrency grew single-partition exchanges:\n$conc")
    assert(conc.contains("BroadcastHashJoin"),
      s"PrefixSum offsets not broadcast in concurrency:\n$conc")
    // t-closeness: the global value-totals join is broadcast; the only
    // data-sized exchange is the (class, value) aggregate
    val tc = plan("q_t_closeness")
    assert(tc.contains("BroadcastHashJoin"),
      s"t-closeness value join not broadcast:\n$tc")
    assert(!tc.contains("CartesianProduct"))
  }

  test("graph wave: assortativity is hash-joined power sums, SALSA and " +
      "SRM keep broadcast scalars, no cartesian anywhere") {
    // assortativity: degree joins are hash joins into ONE power-sum
    // aggregate; the single-row math broadcasts nothing data-sized
    val asr = plan("q_assortativity")
    assert(!asr.contains("CartesianProduct"),
      s"assortativity grew a cartesian product:\n$asr")
    assert(asr.contains("Int128Sum") || asr.contains("int128"),
      s"assortativity lost the exact int128 power sums:\n$asr")
    // SALSA: the per-half-step aggregates are hash aggregates over a
    // hash-joined edge table — never a nested loop
    val sal = plan("q_salsa")
    assert(!sal.contains("CartesianProduct"),
      s"salsa grew a cartesian product:\n$sal")
    // SRM: one user-level hash aggregate + single-row math
    val srm = plan("q_srm")
    assert(!srm.contains("CartesianProduct") &&
      "HashAggregate".r.findAllIn(srm).nonEmpty,
      s"srm lost the single-aggregate shape:\n$srm")
  }

  test("eval/stat wave: rank-band queries ride ONE range exchange, " +
      "the median scan never rides a data-sized global window, " +
      "TextRank stays hash-joined") {
    // decile lift / Qini / Lorenz / conformal / stratified ATE: the
    // running counts ride PrefixSum — its signature in the executed
    // plan is the BROADCAST pid-offsets join back onto the
    // checkpointed prefix table (`_ps_pid`); a data-sized ranking
    // must never appear as a partition-less row_number window, and
    // nothing cartesians (the qini/conformal 1-row scalar cross joins
    // are BroadcastNestedLoop over single rows, not products of data)
    for (q <- Seq("q_decile_lift", "q_qini", "q_lorenz", "q_conformal",
        "q_strat_ate")) {
      val p = plan(q)
      assert("BroadcastHashJoin \\[_ps_pid".r.findAllIn(p).nonEmpty,
        s"$q lost PrefixSum's broadcast pid-offsets join:\n$p")
      assert(!p.contains("CartesianProduct"),
        s"$q grew a cartesian product:\n$p")
      assert(!"row_number".r.findAllIn(p).exists(_ => true) ||
        !p.contains("windowspecdefinition(specifiedwindowframe"),
        s"$q ranks through a partition-less window:\n$p")
    }
    // Brown–Forsythe: the per-group median scan is PrefixSum + a
    // k-row offsets window — the value table must never funnel
    // through a data-sized partition-less sort window
    val bf = plan("q_levene")
    assert("BroadcastHashJoin \\[_ps_pid".r.findAllIn(bf).nonEmpty,
      s"levene median scan lost the PrefixSum shape:\n$bf")
    assert(bf.contains("Int128Sum") || bf.contains("int128"),
      s"levene lost the exact int128 F sums:\n$bf")
    // TextRank: term-graph iterations are hash joins over the
    // checkpointed edge table; the corpus never cartesians
    val tr = plan("q_textrank")
    assert(!tr.contains("CartesianProduct"),
      s"textrank grew a cartesian product:\n$tr")
    // collocations: margins join back by hash; top-k is
    // TakeOrderedAndProject, never a global sort
    val cl = plan("q_collocations")
    assert(cl.contains("TakeOrderedAndProject"),
      s"collocations lost the top-k prune:\n$cl")
    assert(!cl.contains("CartesianProduct"))
  }
}
