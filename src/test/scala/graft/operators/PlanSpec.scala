package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** Plan-shape assertions: the 100 TB design claims in Relational/Chunking
  * must be visible in the physical plan, not just intended. */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q5 star join broadcasts every dimension (no shuffle join for dims)") {
    val p = plan(Relational.localSupplierVolume(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
    // supplier, customer, nation, region all broadcast -> at least 4
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(2000))
  }

  test("q3 broadcasts the filtered customer dim") {
    val p = plan(Relational.shippingPriority(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q7 double-nation join: four broadcasts, facts meet in one shuffle join") {
    val p = plan(Relational.volumeShipping(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(2000))
  }

  test("q10 final selection is a bounded TakeOrdered, not a global sort+limit") {
    val p = plan(Relational.returnedItemRevenue(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("q14/q19 join part as a broadcast; q19's OR stays out of a nested loop") {
    val p14 = plan(Relational.promoRevenue(spark, sf))
    assert(p14.contains("BroadcastHashJoin"), p14.take(2000))
    assert(p14.contains("PushedFilters: [IsNotNull(l_shipdate)"), p14.take(3000))
    val p19 = plan(Relational.disjunctiveRevenue(spark, sf))
    assert(p19.contains("BroadcastHashJoin"), p19.take(2000))
    assert(!p19.contains("BroadcastNestedLoopJoin"), p19.take(2000))
  }

  test("q18: customer dim broadcasts, orderkey join unhinted, TakeOrdered selection") {
    // the over-threshold relation is keyed by l_orderkey (fact-scaled), so
    // it must NOT be hint-forced into a broadcast — AQE picks the physical
    // form from measured sizes (round-7 sf1 probe). The static plan may
    // therefore SMJ the orderkey join; the contract is: customer dim still
    // broadcasts, selection is a bounded TakeOrdered, and the fact table
    // aggregates exactly once (one lineitem scan).
    val p = plan(Relational.largeOrders(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("lineitem.parquet")) == 1,
      p.take(2000))
  }

  test("q4 order-priority check plans as one LEFT SEMI join (no order duplication)") {
    val p = plan(Relational.orderPriorityCheck(spark, sf))
    assert(p.linesIterator.exists(l => l.contains("Join") && l.contains("LeftSemi")),
      p.take(2000))
  }

  test("q6 forecast revenue: all predicates reach the scan; no exchange before partial agg") {
    val p = plan(Relational.forecastRevenue(spark, sf))
    assert(p.contains("PushedFilters") && p.contains("l_discount"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("q8 market share: one fact-fact join, every dim side broadcasts") {
    val p = plan(Relational.marketShare(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p.take(3000))
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).size <= 2, p.take(3000))
  }

  test("q13 distribution pre-aggregates orders before the outer join") {
    val df = Relational.custOrderDistribution(spark, sf)
    df.collect()
    val p = plan(df)
    // the aggregate must appear below the outer join: the join's input is
    // one row per customer, not one row per order
    val aggIdx = p.indexOf("HashAggregate")
    assert(aggIdx >= 0, p.take(2000))
    assert(p.contains("LeftOuter") || p.contains("RightOuter"), p.take(3000))
  }

  test("q15 top supplier reuses the revenue aggregate; max broadcasts back") {
    val p = plan(Relational.topSupplier(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("q17 avg-per-part broadcasts back; part prune semi-reduces lineitem first") {
    val p = plan(Relational.smallQtyRevenue(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("q21 reformulation: supplier dim broadcasts; per-order stats unhinted") {
    // per-order stats are fact-scaled (keyed by orderkey) — no forced
    // broadcast (round-7 sf1 probe); both sides of that join already hash
    // on orderkey, and AQE may still choose broadcast from measured sizes.
    // Contract: supplier dim broadcasts, selection is bounded TakeOrdered.
    val df = Relational.waitingSuppliers(spark, sf)
    df.collect()
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
  }

  test("q22 anti join keys on the pre-distincted recent set; scalar avg broadcasts") {
    val df = Relational.salesOpportunity(spark, sf)
    df.collect()
    val p = plan(df)
    assert(p.linesIterator.exists(l => l.contains("Join") && l.contains("LeftAnti")),
      p.take(3000))
  }

  test("alpha mixture: quotas broadcast, one window shuffle, sqrt shares sane") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang")
    val out = Sampling.alphaMixture(docs, "doc_id", "lang", 100L)
    val p = plan(out)
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    val rows = out.collect()
    val byLang = rows.groupBy(_.getAs[String]("lang")).view.mapValues(_.length).toMap
    val natural = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // sqrt compression: the rarest stratum's share of the sample exceeds
    // its share of the corpus; the commonest stratum's share shrinks
    val total = rows.length.toDouble
    val natTotal = natural.values.sum.toDouble
    val rare = natural.minBy(_._2)._1; val common = natural.maxBy(_._2)._1
    assert(byLang(rare) / total > natural(rare) / natTotal)
    assert(byLang(common) / total < natural(common) / natTotal)
  }

  test("range predicate pushes down to the parquet scan") {
    val df = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") >= 100L && col("l_orderkey") < 200L)
      .select("l_orderkey", "l_linenumber")
    val p = plan(df)
    assert(p.contains("PushedFilters") &&
      (p.contains("GreaterThanOrEqual(l_orderkey,100)") || p.contains("IsNotNull")), p)
  }

  test("column pruning reaches the scan (2-column projection reads 2 columns)") {
    val df = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val p = plan(df)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), p)
  }

  test("q1 aggregation is partial->final (map-side combine present)") {
    val p = plan(Relational.pricingSummary(spark, sf))
    assert(p.contains("HashAggregate"))
    assert("HashAggregate".r.findAllIn(p).size >= 2, "expected partial+final agg")
  }

  test("stratified sample is a pure narrow map: no exchange, 2-column scan") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang")
    val p = plan(Sampling.stratified(docs, "doc_id", "lang", Map("en" -> 37), 83))
    assert(!p.contains("Exchange"), p.take(2000))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string>"), p.take(2000))
  }

  test("quantize digest is a pure narrow map over the embedding scan") {
    val p = plan(graft.operators.VectorOps
      .quantizeDigest(Tables.embeddings(spark, sf)))
    assert(!p.contains("Exchange"), p.take(2000))
  }

  test("distributed interval zip has no unpartitioned window") {
    val li = Tables.lineitem(spark, sf)
      .withColumn("ts_epoch", col("l_shipdate").cast("timestamp").cast("long"))
    val b = Chunking.boundariesDistributed(li, "ts_epoch",
      Seq("l_orderkey", "l_linenumber"), 100L, 788918400L)
    val df = Chunking.intervalsDistributed(b, "ts_epoch", 788918400L)
    df.collect() // finalize AQE
    val p = plan(df)
    // every Window in the plan is partitioned by __pid; the boundary-count
    // offsets window runs over O(#partitions) rows, not the boundary set
    val winLines = p.linesIterator.filter(_.contains("Window ")).toList
    assert(winLines.nonEmpty)
    winLines.filterNot(_.contains("__offset")).foreach { l =>
      assert(l.contains("__pid"), s"unpartitioned window over data rows: $l")
    }
  }

  test("seq packing: data windows are bucket-partitioned; offsets window sees buckets only") {
    val df = Packing.packSequences(Tables.documents(spark, sf))
    df.collect() // finalize AQE
    val p = plan(df)
    val winLines = p.linesIterator.filter(_.contains("Window ")).toList
    assert(winLines.nonEmpty)
    // the only unpartitioned window is the per-bucket offsets cumsum (__tot),
    // which runs over corpus/bucketSize rows, never the document stream
    winLines.filterNot(_.contains("__tot")).foreach { l =>
      assert(l.contains("__b"), s"unpartitioned window over document rows: $l")
    }
  }

  test("decontaminate: benchmark gram set broadcasts into the semi-join") {
    val df = TextAnalysis.decontaminate(Tables.documents(spark, sf))
    df.collect()
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin") &&
      p.linesIterator.exists(l => l.contains("BroadcastHashJoin") && l.contains("LeftSemi")),
      p.take(3000))
  }

  test("vocabulary top-k runs as TakeOrdered, not a global window sort") {
    val df = TextAnalysis.vocabulary(Tables.documents(spark, sf))
    df.collect()
    val p = plan(df)
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
  }

  test("nearDupSurvivorsVsHistory: history side never sort-merge joins") {
    val docs = Tables.documents(spark, sf)
    val df = NearDup.nearDupSurvivorsVsHistory(
      docs.filter(pmod(col("doc_id"), lit(5)) === 0),
      docs.filter(pmod(col("doc_id"), lit(5)) =!= 0))
    df.collect()
    val p = plan(df)
    assert(!p.contains("SortMergeJoin"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("hard-negative mining (IVF): probe table and anchors broadcast") {
    val df = Similarity.hardNegativesIvf(Tables.embeddings(spark, sf))
    df.collect()
    val p = plan(df)
    // the driver-bounded probe table joins members broadcast (hinted in
    // the operator — size estimation drifts when a cached corpus fragment
    // substitutes in); corpus-side joins may legitimately shuffle at scale,
    // so only the probe/anchor joins are pinned
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin [list") || (l.contains("BroadcastHashJoin") &&
        l.contains("[list"))), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("ivf recall report: one rank window over the depth axis") {
    val df = IvfIndex.recallReport(Tables.embeddings(spark, sf))
    df.collect()
    val p = plan(df)
    // four rank windows (argmin, probe rank, per-depth rank, brute top-k),
    // printed twice by AQE (initial + final sections) = 8 — the depth axis
    // is a filter inside ONE window; four re-probed plan copies would show
    // 7 windows per section (14 lines)
    assert(p.linesIterator.count(_.contains("Window [")) <= 8, p.take(3000))
  }

  test("lm signal: the vocab head broadcasts into the scoring join") {
    val df = TextAnalysis.bigramFrequencySignal(Tables.documents(spark, sf))
    df.collect()
    val p = plan(df)
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftOuter")), p.take(3000))
  }

  test("adc scoring: query LUT table broadcasts, corpus codes stay a narrow map") {
    val df = PqIndex.adcTopK(Tables.embeddings(spark, sf), nQueries = 2, k = 3)
    df.collect()
    val p = plan(df)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("adc selection is a bounded-heap partial aggregate, not a corpus window") {
    val df = PqIndex.adcTopK(Tables.embeddings(spark, sf), nQueries = 2, k = 3)
    df.collect()
    val p = plan(df)
    // the round-4 funnel: row_number over partitionBy(q_id) put the whole
    // scored corpus of a query into one window task
    assert(!p.contains("Window"), p.take(3000))
    // typed Aggregator plans as ObjectHashAggregate (or SortAggregate) with
    // a partial mode before the exchange — per-task state is O(k) per query
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      p.take(3000))
  }

  test("ivfpq: probe table broadcasts so unprobed corpus rows die in the scan") {
    val df = PqIndex.ivfpqTopK(Tables.embeddings(spark, sf), nQueries = 2, k = 3)
    df.collect()
    val p = plan(df)
    // membership + LUT joins both broadcast; the corpus side never shuffles
    // into a join (the only Window left is the probe ranking, whose input is
    // nQueries x nLists rows)
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
    // selection is the bounded-heap partial aggregate, not a corpus window
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      p.take(3000))
  }

  test("broadcast guard: an oversize small side drops the hint, result unchanged") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), length(col("text")).as("len"))
    val forced = Relational.groupZScore(docs, "lang", "len")
    val degraded = Relational.groupZScore(docs, "lang", "len",
      broadcastGuardRows = Some(0L))
    val passed = Relational.groupZScore(docs, "lang", "len",
      broadcastGuardRows = Some(1000000L))
    // the guard governs the HINT (the planner may still choose broadcast on
    // its own for a tiny side — that's fine; forcing past 8 GB is not)
    assert(!degraded.queryExecution.analyzed.toString.contains("ResolvedHint"))
    assert(passed.queryExecution.analyzed.toString.contains("ResolvedHint"))
    assert(degraded.orderBy("doc_id").collect().toSeq ==
      forced.orderBy("doc_id").collect().toSeq)

    val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val hist = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val fNew = Dedup.newAgainstHistory(batch, hist, "doc_id")
    val dNew = Dedup.newAgainstHistory(batch, hist, "doc_id",
      broadcastGuardRows = Some(0L))
    assert(!dNew.queryExecution.analyzed.toString.contains("ResolvedHint"))
    assert(dNew.orderBy("doc_id").collect().toSeq ==
      fNew.orderBy("doc_id").collect().toSeq)
  }

  test("distributed boundaries avoid the global single-partition window") {
    val li = Tables.lineitem(spark, sf)
      .withColumn("ts_epoch", col("l_shipdate").cast("timestamp").cast("long"))
    val pDist = plan(Chunking.boundariesDistributed(li, "ts_epoch",
      Seq("l_orderkey", "l_linenumber"), 100L, 788918400L))
    // parity version funnels through a single unpartitioned Window:
    val pParity = plan(Chunking.boundaries(li, "ts_epoch",
      Seq("l_orderkey", "l_linenumber"), 100L, 788918400L))
    // the distributed one partitions its windows by __pid
    assert(pDist.contains("__pid"))
    assert(!pParity.contains("__pid"))
  }

  test("q2 min-cost supplier: dims broadcast, min table joins back on partkey") {
    val df = Relational.minCostSupplier(spark, sf)
    val p = plan(df)
    // part, supplier⨝nation⨝region all broadcast
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p.take(3000))
    assert(df.count() > 0)
  }

  test("q9 profit: part/supplier/nation broadcast, single groupBy shuffle") {
    val p = plan(Relational.productProfit(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p.take(3000))
    // one real exchange for the (nation, year) aggregate; dims add none
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, p.take(3000))
  }

  test("q11 important parts: scalar threshold is a 1-row broadcast, not a shuffle") {
    // sf0.001's 10-supplier sample has nobody in the default NATION_7;
    // pick one that exists here (the oracle runs the default at sf0.01)
    val df = Relational.importantParts(spark, sf, nationName = "NATION_13")
    val p = plan(df)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(3000))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // kept parts all clear the threshold and arrive value-descending
    val vals = rows.map(_.getDouble(1)).toSeq
    assert(vals == vals.sorted.reverse)
  }

  test("q16 supplier count: excluded suppliers anti-join as a broadcast") {
    val p = plan(Relational.supplierCountByPart(spark, sf))
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftAnti")), p.take(3000))
  }

  test("q20 promotion: qualifying keys reach supplier as a LEFT SEMI join") {
    val df = Relational.promotionSuppliers(spark, sf)
    val p = plan(df)
    assert(p.linesIterator.exists(l => l.contains("LeftSemi")), p.take(3000))
    assert(df.count() > 0)
  }

  test("marketBasket: frequent-item and count joins broadcast; no nested loop") {
    val p = plan(Graph.marketBasket(Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")), "l_orderkey", "l_partkey",
      minItemSupport = 2, minPairSupport = 1))
    // freq semi-filter + cnt_a + cnt_b + n_baskets = 4 broadcast joins
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // top-N is a bounded TakeOrdered, never a global sort
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
  }

  test("recommendations: rank window partitions by item, not a global window") {
    val b = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
    val p = plan(Graph.recommendations(b, "basket", "item", minCo = 1))
    // the Window node must carry a partition spec (no empty-partition
    // global window, which would serialize the whole catalog)
    val winLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.nonEmpty, p.take(2000))
    assert(winLines.exists(_.contains("item_a")), winLines.mkString("\n"))
  }

  test("pageRank: per-iteration shuffles are rank-sized — edges exchange once") {
    import spark.implicits._
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")).toDF("s", "d")
    val df = Graph.pageRank(e, "s", "d", iters = 3)
    val p = plan(df)
    // the persisted edge relation appears as InMemoryTableScan consumers —
    // one per iteration — instead of re-deriving the edge pipeline
    assert(p.contains("InMemoryTableScan"), p.take(3000))
  }

  test("labelPropagation: iterations consume the persisted edge cache") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("x", "y")
    val p = plan(Graph.labelPropagation(e, "x", "y"))
    assert(p.contains("InMemoryTableScan"), p.take(3000))
  }

  test("resolveIncremental: batch key sides broadcast against history") {
    import spark.implicits._
    val history = (1L to 50L).map(i => (i, s"n$i", s"e$i@x")).toDF("id", "name", "email")
    val hEnt = EntityResolution.resolve(history, "id",
      Seq(col("name"), col("email")))
    val batch = Seq((100L, "n1", "zz@x")).toDF("id", "name", "email")
    val p = plan(EntityResolution.resolveIncremental(history, hEnt, batch, "id",
      Seq(col("name"), col("email"))))
    // each pass joins history's key projection to the BROADCAST batch side
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("line dedup: the boilerplate head broadcasts into the anti-join") {
    val docs = Tables.documents(spark, sf)
    val p = plan(LineDedup.scrub(docs, 2, 20))
    // LEFT ANTI against the hot-line set must be a broadcast join — the
    // corpus-sized line stream never hash-partitions on line text
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      p.take(3000))
    // the corpus count rides in as a broadcast nested-loop of ONE row
    assert(!p.contains("SortMergeJoin(leftanti"), p.take(3000))
  }

  test("ksTest: value-grain ladder — two partial aggregates, totals broadcast") {
    val p = plan(Relational.ksTest(Tables.documents(spark, sf),
      "lang", "n_chars", "en", "de"))
    // count ladder is partial -> final (map-side combine before exchange)
    assert(p.contains("partial_count") || p.contains("partial count") ||
      "HashAggregate".r.findAllIn(p).size >= 4, p.take(3000))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p.take(3000))
  }

  test("quantileSketch: sample ids and estimates broadcast; no shuffle join") {
    val p = plan(Merge.quantileSketch(Tables.orders(spark, sf), k = 64,
      id = "o_orderkey", valueCol = "o_totalprice"))
    // the |qs|-row estimate frame broadcasts into the audit pass; the
    // row-grain side never sort-merges or hash-joins — the sample is one
    // bounded-heap aggregation pass
    assert(p.contains("BroadcastExchange"), p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      p.take(3000))
  }

  test("image phash near-pairs: payloads never shuffle; bands join hash rows") {
    import spark.implicits._
    val ph = ImagePhash.phash(ImagePhash.synthesize(
      spark.createDataset((0L until 60L).map(java.lang.Long.valueOf)))).toDF()
    val p = plan(ImagePhash.nearPairs(ph, 3))
    // every exchange in the candidate join carries band/hash rows (longs),
    // never the binary payload column
    assert(!p.contains("payload"), p.take(3000))
  }

  test("welchTTest: one row-grain hash aggregate, no join anywhere") {
    val p = plan(Relational.welchTTest(
      Tables.documents(spark, sf).withColumn("arm",
        when(col("lang") === "en", "en").otherwise("other")),
      "arm", "n_chars"))
    assert(!p.contains("Join"), p.take(2000))
    // row stream -> 2 arm rows -> 1 row: hash aggregates only
    assert(p.contains("HashAggregate"), p.take(2000))
  }

  test("tCloseness: the row stream aggregates ONCE; every stitch broadcasts") {
    // checkpoint the base input: the contract under test is tCloseness's
    // OWN stitches. An inlined base join would re-plan once per consumer
    // subtree, and its physical form flips when other suites mutate the
    // shared session's broadcast threshold (BucketedJoinSpec sets -1) —
    // both effects are the caller's plan, not this operator's.
    val base = Tables.customer(spark, sf).join(Tables.orders(spark, sf),
      col("c_custkey") === col("o_custkey"))
      .select("c_nationkey", "c_mktsegment", "o_orderpriority")
      .localCheckpoint()
    val p = plan(Validate.tCloseness(base, "c_nationkey", "c_mktsegment",
      "o_orderpriority"))
    // the class/domain/cells/totals frames are category-cardinality-sized
    // and must all meet as broadcasts (hinted — threshold-independent),
    // never a shuffled join
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      p.take(3000))
    assert(p.contains("BroadcastExchange"), p.take(3000))
  }

  test("targetEncode: row stream leaves at the (category, fold) aggregate; " +
    "totals are windows over that grid") {
    val p = plan(Classifier.targetEncode(Tables.documents(spark, sf),
      "source", "doc_id", when(col("lang") === "en", 1).otherwise(0)))
    assert(!p.contains("Join"), p.take(2000))
    // one row-grain aggregate feeds the window stack
    assert(p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("documents.parquet")) == 1,
      p.take(2000))
  }

  test("acfDaily / holtForecast: row stream leaves at the day-grain aggregate") {
    val pa = plan(Funnel.acfDaily(Tables.events(spark, sf)))
    // the self-join runs on the day-grain relation — both join inputs are
    // post-aggregate, so exactly two aggregated scans of events, no more
    assert(pa.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("events.parquet")) <= 2,
      pa.take(2000))
    val ph = plan(Funnel.holtForecast(Tables.events(spark, sf)))
    assert(!ph.contains("Join"), ph.take(2000))
  }
}
