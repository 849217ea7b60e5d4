package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout levers that only pay off at cluster scale — asserted on
  * the physical plan, not just the result:
  *
  *   - q65's bucketed join must NOT shuffle either input: the whole point
  *     of bucketing the fact table once is that every later join is
  *     map-side. A regression that re-introduces `Exchange
  *     hashpartitioning(o_custkey...)` silently costs a 100 TB shuffle
  *     per query at scale while still returning correct rows.
  *   - Partitioned writes must prune at the source: a reader with a
  *     partition-column predicate should list only matching directories
  *     (PartitionFilters in the scan), never scan-and-filter.
  */
class StorageLayoutSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("storage-layout")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("q65: bucketed sort-merge join reads both sides in place — no exchange on either join input") {
    val df = Registry.byName("q65_bucketed_join").build(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ (merge hint + bucketed layout):\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(o_custkey"),
      s"orders side re-shuffled — bucketed layout not used:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(c_custkey"),
      s"customer side re-shuffled — bucketed layout not used:\n$plan")
    // The bucketed scan itself is visible in the plan: all 8 buckets of
    // each side selected (no bucket pruning predicate in this query).
    assert(plan.contains("SelectedBucketsCount: 8 out of 8"), s"bucketed read not planned:\n$plan")
  }

  test("q65: the only exchanges are post-join (aggregate/sort), never under the join") {
    val df = Registry.byName("q65_bucketed_join").build(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // groupBy(c_mktsegment) + orderBy legitimately shuffle the 5-row-ish
    // aggregate; the join inputs must contribute zero exchanges.
    val exchanges = plan.split("\n").count(_.trim.startsWith("+- Exchange") ) +
      plan.split("\n").count(_.trim.startsWith(":- Exchange"))
    assert(exchanges <= 2, s"unexpected exchange count ($exchanges):\n$plan")
  }

  test("partitioned parquet write + partition-pruned read: scan lists only the matching directory") {
    val root = graft.BuildPaths.scratch("partitioned-events")
    graft.Tables.load(spark, sfDir, "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(root)

    val clicks = spark.read.parquet(root).filter(org.apache.spark.sql.functions.col("event_type") === "click")
    val plan = clicks.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("event_type"),
      s"partition predicate not pushed to directory listing:\n$plan")
    // Pruning is real, not cosmetic: the scan's data filters must NOT
    // re-check event_type (it is a partition column, resolved at listing).
    val expected = graft.Tables.load(spark, sfDir, "events")
      .filter(org.apache.spark.sql.functions.col("event_type") === "click").count()
    assert(clicks.count() === expected)
  }

  test("q77: the day-range predicate prunes partitions at listing time — no data-filter re-check") {
    val plan = Registry.byName("q77_partition_pruned").build(spark, sfDir)
      .queryExecution.executedPlan.toString
    val scanLine = plan.split("\n").find(_.contains("PartitionFilters:"))
    assert(scanLine.isDefined, s"no partitioned scan in plan:\n$plan")
    assert(scanLine.get.matches(".*PartitionFilters: \\[[^\\]]*\\(d#\\d+ >= .*"),
      s"day range not in PartitionFilters:\n${scanLine.get}")
    // The data/pushed filters must be EMPTY — pruning happened at
    // directory listing, not per-row (the only predicate is on `d`).
    assert(scanLine.get.contains("DataFilters: []"),
      s"partition predicate re-checked per-row:\n${scanLine.get}")
    assert(scanLine.get.contains("PushedFilters: []"),
      s"partition predicate pushed as a data filter:\n${scanLine.get}")
  }

  test("partition + data predicates split correctly: day range prunes directories, row predicate pushes to parquet") {
    import org.apache.spark.sql.functions.col
    // Mixed-filter query over q77's layout: the day range must land in
    // PartitionFilters (directory listing) while the event_type equality
    // lands in PushedFilters (parquet row groups) — each pruning level
    // doing its own job, neither leaking into the other.
    Registry.byName("q77_partition_pruned").build(spark, sfDir) // ensures layout
    val root = graft.BuildPaths.scratch(
      s"events_by_day/${graft.BuildPaths.dirKey(sfDir)}")
    val plan = spark.read.parquet(root)
      .filter(col("d").between("2024-01-08", "2024-01-14") && col("event_type") === "click")
      .queryExecution.executedPlan.toString
    val scanLine = plan.split("\n").find(_.contains("PartitionFilters:"))
    assert(scanLine.isDefined, s"no partitioned scan:\n$plan")
    assert(scanLine.get.matches(".*PartitionFilters: \\[[^\\]]*\\(d#\\d+ >= .*"),
      s"day range not pruning directories:\n${scanLine.get}")
    assert(scanLine.get.matches(".*PushedFilters: \\[[^\\]]*EqualTo\\(event_type,click\\).*"),
      s"row predicate not pushed to parquet:\n${scanLine.get}")
  }

  test("q94's payoff: z-ordered files bound BOTH dimensions, so a y-band predicate can skip most files") {
    import org.apache.spark.sql.functions._
    // The mechanism behind OPTIMIZE ZORDER, asserted on REAL file stats:
    // write the same 128x128 grid twice — range-partitioned by x (a
    // linear sort) and by the Morton key — and measure each file's
    // y-extent. Linear-by-x files each span the FULL y range (a y-band
    // predicate prunes nothing); z-ordered files cover bounded tiles, so
    // the same band intersects only a fraction. Parquet min/max row-group
    // stats do the skipping in production; per-file min/max is the same
    // statistic one level up, observable without reader internals.
    val n = 128 * 128
    val grid = spark.range(n).select(
      (col("id") % 128).as("x"), (col("id") / 128).cast("long").as("y"))
    val byX = graft.BuildPaths.scratch("layout-by-x")
    val byZ = graft.BuildPaths.scratch("layout-by-z")
    grid.repartitionByRange(16, col("x"))
      .write.mode("overwrite").parquet(byX)
    grid.select(col("x"), col("y"), Analytics.zValue(col("x"), col("y")).as("zv"))
      .repartitionByRange(16, col("zv"))
      .write.mode("overwrite").parquet(byZ)

    def filesIntersectingYBand(root: String, lo: Long, hi: Long): (Int, Int) = {
      val files = new java.io.File(root).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
      val hit = files.count { f =>
        val r = spark.read.parquet(f).agg(min("y"), max("y")).head()
        r.getLong(0) <= hi && r.getLong(1) >= lo
      }
      (hit, files.length)
    }
    val (xHit, xAll) = filesIntersectingYBand(byX, 0, 15)
    val (zHit, zAll) = filesIntersectingYBand(byZ, 0, 15)
    assert(xAll >= 8 && zAll >= 8, s"expected multi-file layouts: $xAll / $zAll")
    assert(xHit === xAll,
      s"x-sorted layout should NOT bound y (every file spans the band): $xHit of $xAll")
    // 16 contiguous z-ranges over a 128x128 grid ≈ 32x32 tiles: a 16-row
    // band intersects ~1/4 of them. Allow slack for repartitionByRange's
    // sampled boundaries — the claim is "most files skipped", not a tiling.
    assert(zHit <= zAll / 2,
      s"z-ordered layout should skip most files for a y-band: $zHit of $zAll hit")
  }

  test("bench gram table is write-once and the broadcast decon probe never re-derives or shuffles the corpus side") {
    // The q149 decontamination stage against the STORED benchmark gram
    // set (VERDICT r13 item 6): the gram table is written once per
    // source dir; every later run probes it. In the broadcast shape the
    // plan must show (a) exactly ONE Generate node — the corpus
    // shingle explode; the benchmark split is NOT re-exploded per run —
    // and (b) no shuffle of the probe side below the semi join.
    val t0 = Pipeline.ensureBenchGramTable(spark, sfDir)
    val t1 = Pipeline.ensureBenchGramTable(spark, sfDir) // no-op rewrite
    assert(t0 === t1)
    val df = Pipeline.decontaminateStoredGrams(spark, sfDir, merge = false)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected broadcast semi probe:\n$plan")
    val generates = plan.split("\n").count(_.contains("Generate explode"))
    assert(generates === 1,
      s"benchmark grams re-derived per run ($generates Generate nodes):\n$plan")
    // The only exchanges are the post-join distinct/agg — the corpus
    // probe side reaches the semi join unshuffled (no (lang, g)-keyed
    // exchange anywhere; the post-agg hashpartitioning(lang) alone is
    // not a join shuffle).
    assert(!plan.matches("(?s).*Exchange hashpartitioning\\(lang#\\d+, g#\\d+.*"),
      s"probe side shuffled on the join key:\n$plan")
    // And the join actually prunes: some pool docs share benchmark grams.
    assert(df.agg(org.apache.spark.sql.functions.sum("n_contaminated")).head().getLong(0) > 0)
  }

  test("full-eval-suite fallback: sort-merge decon probe reads the bucketed gram side in place — zero exchange on the stored table") {
    // When the gram set outgrows broadcast, the bucketed write pays off
    // the q65 way: SMJ semi join where the stored side's 8 buckets are
    // read in place (SelectedBucketsCount, no Exchange) and the ONLY
    // join-key shuffle is the per-run corpus side.
    val df = Pipeline.decontaminateStoredGrams(spark, sfDir, merge = true)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") && plan.contains("LeftSemi"),
      s"expected sort-merge semi probe:\n$plan")
    assert(plan.contains("SelectedBucketsCount: 8 out of 8"),
      s"bucketed gram read not planned:\n$plan")
    val joinKeyExchanges = plan.split("\n").count(
      _.matches(".*Exchange hashpartitioning\\(lang#\\d+, g#\\d+.*"))
    assert(joinKeyExchanges === 1,
      s"expected exactly the corpus-side shuffle ($joinKeyExchanges (lang, g)-keyed exchanges):\n$plan")
    // Both physical shapes agree with each other (same rows).
    val bc = Pipeline.decontaminateStoredGrams(spark, sfDir, merge = false)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val sm = df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sm === bc)
  }

  test("BPE model is a write-once artifact: consumers probe the stored vocab, never re-train (VERDICT r14 #1)") {
    // r14's defect: q150/q151/q156/q162 each re-trained the 24 merge
    // rules in-query (~7 redundant corpus-sized scans per run, 17% of
    // the bench). Now ensureBpeModel persists the merge table + the
    // tokenized vocab ONCE per (JVM, dir), and the consumer PLANS prove
    // it: no word-histogram aggregate, the model read in place.
    val (m0, v0) = PipelineTokenizer.ensureBpeModel(spark, sfDir)
    val (m1, v1) = PipelineTokenizer.ensureBpeModel(spark, sfDir) // no-op rewrite
    assert((m0, v0) === (m1, v1))

    // q150 reads ONLY the stored merge table — zero corpus scans.
    val trainPlan = Registry.byName("q150_bpe_train").build(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(trainPlan.contains(m0), s"q150 not reading the stored model:\n$trainPlan")
    assert(!trainPlan.contains("documents.parquet"),
      s"q150 re-scans the corpus after training is stored:\n$trainPlan")

    // q151 probes the stored vocab with exactly ONE corpus scan (the
    // word re-join) — the r14 version paid three (train histogram +
    // vocab histogram + corpus join).
    val tokPlan = Registry.byName("q151_bpe_tokenize").build(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(tokPlan.contains(v0), s"q151 not probing the stored vocab:\n$tokPlan")
    val corpusScans = tokPlan.split("\n").count(_.contains("documents.parquet"))
    assert(corpusScans === 2, // one probe join side + one left-join spine
      s"expected the corpus probe + doc spine only ($corpusScans documents scans):\n$tokPlan")

    // q173's ID stream likewise builds on the stored vocab.
    val idsPlan = Registry.byName("q173_bpe_ids").build(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(idsPlan.contains(v0), s"q173 not probing the stored vocab:\n$idsPlan")
  }

  test("unigram model is a write-once artifact: q175 reads the piece table, q176 probes the vocab") {
    val (p0, v0) = Unigram.ensureUnigramModel(spark, sfDir)
    val (p1, v1) = Unigram.ensureUnigramModel(spark, sfDir) // no-op rewrite
    assert((p0, v0) === (p1, v1))
    val trainPlan = Registry.byName("q175_unigram_train").build(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(trainPlan.contains(p0), s"q175 not reading the stored pieces:\n$trainPlan")
    assert(!trainPlan.contains("documents.parquet"),
      s"q175 re-scans the corpus after training is stored:\n$trainPlan")
    val tokPlan = Registry.byName("q176_unigram_tokenize").build(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(tokPlan.contains(v0), s"q176 not probing the stored vocab:\n$tokPlan")
    val corpusScans = tokPlan.split("\n").count(_.contains("documents.parquet"))
    assert(corpusScans === 2, // probe join side + left-join doc spine
      s"expected the corpus probe + doc spine only ($corpusScans documents scans):\n$tokPlan")
  }

  test("q201/q202: shard exports are REAL files — one parquet file per shard, write-once, digests re-derive from disk") {
    // r15 VERDICT "What's missing" #3: manifests were computed but no
    // operator wrote shard bytes. The export contract: every shard is
    // one directory with exactly ONE file (one task per shard — the
    // seekable unit a trainer mounts), the write is memoized per
    // (JVM, dir), and the reconciliation queries re-derive each shard's
    // digest from the rows READ BACK OFF DISK, matching the manifest.
    val root = Curation.ensureShardExport(spark, sfDir)
    assert(Curation.ensureShardExport(spark, sfDir) === root) // no-op rewrite
    val dirs = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(dirs.length === 16, s"expected 16 shard dirs under $root, saw ${dirs.length}")
    for (d <- dirs) {
      val parts = d.listFiles().filter(f =>
        f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      assert(parts.length === 1,
        s"${d.getName}: expected exactly ONE part file (one task per shard), saw ${parts.length}")
      assert(parts.head.length > 0, s"${d.getName}: empty shard file")
    }
    val rows = Registry.byName("q201_export_shards").build(spark, sfDir).collect()
    assert(rows.length === 16)
    assert(rows.forall(_.getAs[Int]("is_match") === 1),
      "on-disk shard digest diverged from the source-derived manifest")

    val croot = Curation.ensureCrawlExport(spark, sfDir)
    val cdirs = new java.io.File(croot).listFiles()
      .filter(_.getName.startsWith("shard="))
    assert(cdirs.nonEmpty)
    assert(cdirs.forall(_.listFiles().count(_.getName.endsWith(".parquet")) === 1),
      "crawl export: expected one file per shard")
    val crows = Registry.byName("q202_crawl_export").build(spark, sfDir).collect()
    assert(crows.nonEmpty && crows.forall(_.getAs[Int]("is_match") === 1),
      "crawl export digest diverged from the q200 manifest chain")
  }

  test("sketch frames are write-once artifacts: generators and the q189 sweep read the SAME stored table (VERDICT r16 #1)") {
    // The q110 design comment's "stored bucketed table maintained across
    // crawls", made real: each near-dup family's signature/bucket frame
    // is one SketchStore artifact, and every consumer's physical plan
    // must scan THAT table — the generator (q41/q44/q45/q54) and the
    // cross-method sweep (q189) provably grade identical frames, and
    // the corpus-scan + kernel cost is paid once per corpus, not per
    // query. Layout: bucketed+sorted on the join key, one file per
    // bucket (the co-located-SMJ-at-scale contract, q65's rule).
    val names = SketchStore.tableNames(sfDir)
    def plan(q: String): String =
      Registry.byName(q).build(spark, sfDir).queryExecution.executedPlan.toString
    // Tier 1 — the sketch FRAMES: every per-family generator must scan
    // its stored frame artifact (no corpus re-scan, no kernel recompute).
    for ((q, short) <- Seq(
        "q41_near_dup" -> "bands", "q44_simhash" -> "simchunks",
        "q45_ngram_jaccard" -> "shingles", "q54_embedding_near_dup" -> "lshbkt",
        "q110_incremental_near_dup" -> "bands",
        "q100_semantic_dedup" -> "kmembers")) {
      assert(plan(q).contains(names(short)),
        s"$q does not scan the stored ${names(short)} artifact")
    }
    // Tier 4 — the converged NN-DESCENT GRAPH (round 18): both graph-ANN
    // evals read ONE stored (u, w, cos_r) table; the descent's iterative
    // build runs once at artifact build. The q239/q243 oracles recompute
    // the full descent from raw embeddings, so a drifted graph is a
    // hash FAIL — this is the plan-identity half.
    for (q <- Seq("q239_nn_descent", "q243_graph_recall_sampled")) {
      assert(plan(q).contains(names("nngraph")),
        s"$q does not scan the stored ${names("nngraph")} artifact")
    }
    // ...and the SERVE path (q245, round 19) answers out-of-corpus
    // queries by walking the SAME stored graph — beam expansion is a
    // keyed join into the artifact, never a descent re-run. The
    // registry entry checkpoints each round (hiding the join from its
    // final plan), so the artifact scan is pinned on the factored
    // expansion step itself.
    {
      import org.apache.spark.sql.functions.lit
      val beam1 = spark.range(1)
        .select(lit(1L).as("qid"), lit(0L).as("w"), lit(0.5).as("cos_r"))
      val expand = PipelineRetrieval.serveExpand(spark, sfDir, beam1)
        .queryExecution.executedPlan.toString
      assert(expand.contains(names("nngraph")),
        "q245's beam expansion does not join the stored graph artifact")
    }
    // ...and the incremental maintenance pass (q244) probes the stored
    // OLD-cohort base graph and the stored bucket artifact — the batch
    // is absorbed against standing indexes, never a rebuild.
    assert(plan("q244_graph_index_maintain").contains(names("nngraphb")),
      "q244 does not scan the stored base-graph artifact")
    assert(plan("q244_graph_index_maintain").contains(names("lshbkt")),
      "q244 does not probe the stored LSH bucket artifact")
    // Tier 5 — the stored IVF+PQ index (round 20, VERDICT r19 #1): the
    // serve entry probes the residual-encoded (vec_id, cell, m, code)
    // artifact — bucketed by cell, read cell-pruned through a broadcast
    // join — instead of re-encoding the corpus in-query (that rebuild
    // survives only as q249's comparison leg inside the same entry).
    // The q255 oracle recomputes every code from raw embeddings, so a
    // stale or drifted index is a hash FAIL — this is the plan-identity
    // half.
    assert(plan("q255_ivfpq_stored_serve").contains(names("ivfpq")),
      "q255 does not probe the stored ivfpq artifact")
    // Tier 5b (round 20) — the lifecycle layers: the tombstone-fold
    // reconciliation (q258) reads the committed grapht layer as a
    // stored table (its ledger and diff legs scan it in place), the
    // IVFPQ compaction (q263) reads the committed ivfpqc layer, and the
    // IVFPQ deletion view (q262) anti-joins the STANDING ivfpq artifact
    // — none of them re-derives its index from the corpus in-plan.
    val (graphtTbl, _) = SketchStore.ensureTombstoneFoldedGraph(spark, sfDir)
    assert(plan("q258_graph_tombstone_fold").contains(graphtTbl),
      "q258 does not read the committed tombstone-folded graph layer")
    val (ivfpqcTbl, _) = SketchStore.ensureCompactedIvfpq(spark, sfDir)
    assert(plan("q263_ivfpq_compaction").contains(ivfpqcTbl),
      "q263 does not read the committed compacted ivfpq layer")
    assert(plan("q262_ivfpq_delete_propagation").contains(names("ivfpq")),
      "q262 does not probe the standing ivfpq artifact")
    // Tier 3 — the converged CLUSTER ASSIGNMENT (VERDICT r17 #8): the
    // q76 family (q76/q125/q215/q233) reads ONE stored (doc_id,
    // cluster_id) table; the propagation loop runs once at artifact
    // build, not once per consumer. The q76/q125 oracles recompute
    // reachability from raw text (recursive CTE), so a drifted artifact
    // is a hash FAIL — this is the plan-identity half of that pin.
    for (q <- Seq("q76_dup_clusters", "q125_canonical_keep",
        "q215_dedup_weighting", "q233_quality_dup_interaction")) {
      assert(plan(q).contains(names("dupclusters")),
        s"$q does not scan the stored ${names("dupclusters")} artifact")
    }
    // Tier 2 — the candidate PAIRS: the q189 sweep reads the standing
    // pair artifacts (one per family) plus the stored per-doc gram sets.
    val sweep = plan("q189_dedup_method_sweep")
    for (short <- Seq("mhpairs", "simpairs", "rarepairs", "lshpairs",
        "sempairs", "docsets")) {
      assert(sweep.contains(names(short)),
        s"q189 does not scan the stored ${names(short)} artifact")
    }
    // No-drift pin: the stored pair artifacts must EQUAL the generator
    // output pair sets (q189's oracle recomputes them from raw text in
    // DuckDB too — this is the in-repo half of that pin).
    val q41Pairs = Registry.byName("q41_near_dup").build(spark, sfDir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mhStored = SketchStore.mhPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mhStored === q41Pairs,
      "stored mhpairs artifact diverged from q41's generator output")
    val q44Pairs = Registry.byName("q44_simhash").build(spark, sfDir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val simStored = SketchStore.simPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(simStored === q44Pairs,
      "stored simpairs artifact diverged from q44's generator output")
    // One file per bucket: the write repartitions on the bucket columns.
    // Round 19: artifacts are pointer-committed layers — resolve the
    // `_current` pointer (the q241 protocol) and audit THAT layer.
    val root = graft.BuildPaths.scratch(
      s"sketch_store/${graft.BuildPaths.dirKey(sfDir)}")
    for (tbl <- names.values) {
      val layer = Curation.resolveSnapshot(s"$root/$tbl")
      val files = new java.io.File(s"$root/$tbl/$layer").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length <= 8, s"$tbl: expected <= 8 bucket files, saw ${files.length}")
    }
  }

  test("stream and batch share ONE band-index structure: the ingest delta matches the base artifact's layout, root, and transform") {
    // VERDICT r17 #3's done-criterion: q111/q154's maintained index is
    // the SketchStore band DELTA — not a parallel ad-hoc dir. Pin the
    // three facts that make it the same standing structure the batch
    // sweeps (q41/q110/q189) read:
    //   1. same bucketed layout (bucketBy(8, band, key), sorted) as the
    //      base artifact, in the same sketch_store root;
    //   2. rows produced by the SAME transform (SketchStore.bandRowsOf)
    //      the base build uses — recompute equality;
    //   3. the base artifact itself is untouched by stream maintenance.
    import org.apache.spark.sql.functions._
    val baseBefore = SketchStore.bands(spark, sfDir).count()
    // Run the ingest entry (4 toy docs through the bus); it resets and
    // then appends the delta through the shared API.
    Registry.byName("q111_stream_index_maintain").build(spark, sfDir).collect()
    val names = SketchStore.tableNames(sfDir)
    // Deltas are per-invocation tables (ADVICE r18) — the q111 run just
    // above created the newest one; token order = name order.
    val deltaTbl = spark.catalog.listTables()
      .filter(_.name.startsWith("graft_sk_bandsdelta_"))
      .collect().map(_.name).max
    def bucketSpec(tbl: String): String =
      spark.sql(s"DESCRIBE FORMATTED $tbl").collect()
        .filter(r => Seq("Num Buckets", "Bucket Columns", "Sort Columns")
          .contains(r.getString(0)))
        .map(r => s"${r.getString(0)}=${r.getString(1)}").sorted.mkString("|")
    assert(bucketSpec(deltaTbl) === bucketSpec(names("bands")),
      "delta bucket layout diverged from the base band artifact")
    def tableDir(tbl: String): java.io.File =
      new java.io.File(new java.net.URI(
        spark.sql(s"DESCRIBE FORMATTED $tbl").collect()
          .find(_.getString(0) == "Location").get.getString(1)))
    // The base artifact is a pointer-committed LAYER under its root
    // (round 19), so the shared sketch_store root is the base table's
    // grandparent; the (mutable, append-log) delta sits directly in it.
    assert(tableDir(deltaTbl).getParentFile ===
        tableDir(names("bands")).getParentFile.getParentFile,
      "delta does not live in the sketch_store root next to the base artifact")
    // Transform equality: the streamed rows equal a batch recompute of
    // the same toy docs through the SHARED bandRowsOf code path.
    val toyDocs = spark.createDataFrame(Seq(
      (1L, "und", "alpha beta gamma delta"),
      (2L, "und", "the quick brown fox"),
      (3L, "und", "alpha beta gamma delta"),
      (4L, "und", "slow green turtle pace")))
      .toDF("doc_id", "lang", "text")
    val expected = SketchStore.bandRowsOf(spark, toyDocs)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getString(3))).toSet
    val streamed = spark.table(deltaTbl)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getString(3))).toSet
    assert(streamed === expected,
      "stream-maintained delta rows diverged from the shared banding transform")
    assert(SketchStore.bands(spark, sfDir).count() === baseBefore,
      "stream maintenance mutated the write-once base artifact")
  }

  test("q241/snapshot pointer: a reader mid-commit sees exactly one consistent snapshot — old or new, never mixed") {
    // The atomic-commit contract (VERDICT r17 #4): commits write a
    // COMPLETE new layer then swap the `_current` pointer; a reader
    // resolves the pointer once and reads only that immutable layer.
    val root = Curation.ensureSnapshotExport(spark, sfDir) // commits v1 then v2
    assert(Curation.resolveSnapshot(root) === "v2")
    def docsOf(layer: String): Set[Long] =
      spark.read.parquet(s"$root/$layer").select("doc_id")
        .collect().map(_.getAs[Long]("doc_id")).toSet
    val all = graft.Tables.load(spark, sfDir, "documents")
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
      .select("doc_id").collect().map(_.getAs[Long]("doc_id")).toSet
    val baseCohort = all.filter(_ % 10 != 7)
    // Each layer is EXACTLY one consistent snapshot of the source —
    // never a partial or mixed set.
    assert(docsOf("v1") === baseCohort, "v1 is not exactly the base cohort")
    assert(docsOf("v2") === all, "v2 is not exactly the appended corpus")
    // Interleave a read across a commit: a reader that resolved BEFORE
    // the swap keeps reading its immutable layer; one resolving AFTER
    // sees the new snapshot. Simulate by re-committing v1 -> v2.
    Curation.commitPointer(root, "v1")
    val resolvedBeforeSwap = Curation.resolveSnapshot(root)
    Curation.commitPointer(root, "v2") // the "concurrent" append commit
    assert(resolvedBeforeSwap === "v1" && Curation.resolveSnapshot(root) === "v2")
    assert(docsOf(resolvedBeforeSwap) === baseCohort,
      "the pre-swap reader's layer changed under it — snapshots must be immutable")
    assert(docsOf(Curation.resolveSnapshot(root)) === all)
    // The superseded layer survives the commit untouched (time travel):
    // its _SUCCESS marker and file census are intact.
    assert(new java.io.File(s"$root/v1", "_SUCCESS").exists)
  }

  test("sketch artifacts are pointer-committed layers: a refresh swaps atomically, old layer immutable (VERDICT r18 #5)") {
    // The q241 snapshot protocol applied to the sketch store (round 19):
    // every artifact root holds immutable layer-* dirs plus a _current
    // pointer committed via temp-write + ATOMIC_MOVE. A refresh writes a
    // COMPLETE new layer, flips the pointer, and only then swaps the
    // catalog entry — a probe interleaved across the refresh reads the
    // old layer or the new one, never a mix. Here the refresh rebuilds
    // the SAME content (so sibling tests in this JVM stay valid): the
    // pin is the protocol — layer dir changes, old layer's files survive
    // byte-for-byte readable, row content identical.
    import graft.Tables
    val tbl = SketchStore.tableNames(sfDir)("bands")
    SketchStore.bands(spark, sfDir) // ensure v1
    val root = graft.BuildPaths.scratch(
      s"sketch_store/${graft.BuildPaths.dirKey(sfDir)}") + s"/$tbl"
    val layer1 = Curation.resolveSnapshot(root)
    val rows1 = spark.table(tbl).count()
    // An interleaved reader that resolved BEFORE the refresh: it reads
    // the v1 layer path directly (what a resolved scan holds at scale).
    val preSwapReader = spark.read.parquet(s"$root/$layer1")
    SketchStore.refreshTable(spark, sfDir, "bands", Seq("band", "key")) {
      SketchStore.bandRowsOf(spark, Tables.load(spark, sfDir, "documents"))
    }
    val layer2 = Curation.resolveSnapshot(root)
    assert(layer2 !== layer1, "refresh did not commit a new layer")
    // old-or-new, never mixed: the pre-swap reader still sees exactly
    // the old layer's rows; a post-swap resolve sees the new layer.
    assert(preSwapReader.count() === rows1,
      "the superseded layer changed under a pre-swap reader — layers must be immutable")
    assert(new java.io.File(s"$root/$layer1", "_SUCCESS").exists,
      "superseded layer lost its commit marker (time travel broken)")
    assert(spark.table(tbl).count() === rows1,
      "identity refresh changed row content")
    val loc = spark.sql(s"DESCRIBE FORMATTED $tbl").collect()
      .find(_.getString(0) == "Location").get.getString(1)
    assert(loc.endsWith(layer2), s"catalog location $loc does not resolve the new layer $layer2")
  }

  test("superseded-layer GC removes old layers, keeps the committed one, and reads survive") {
    // The retention half of the pointer protocol (the ADVICE-r18 leak
    // class): refreshes accumulate immutable layer-* dirs forever; the
    // maintenance-window GC resolves the pointer and removes everything
    // else. Pins: at least one superseded layer existed and was
    // removed, exactly the committed layer remains, and the table's
    // rows read back unchanged through the catalog.
    import graft.Tables
    val tbl = SketchStore.tableNames(sfDir)("bands")
    SketchStore.bands(spark, sfDir)
    val rows0 = spark.table(tbl).count()
    // an identity refresh guarantees >= 2 layers on disk
    SketchStore.refreshTable(spark, sfDir, "bands", Seq("band", "key")) {
      SketchStore.bandRowsOf(spark, Tables.load(spark, sfDir, "documents"))
    }
    val root = graft.BuildPaths.scratch(
      s"sketch_store/${graft.BuildPaths.dirKey(sfDir)}") + s"/$tbl"
    def layers(): Seq[String] = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("layer-"))
      .map(_.getName).toSeq
    assert(layers().size >= 2, s"expected >= 2 layers before GC, saw ${layers()}")
    val removed = SketchStore.gcSupersededLayers(spark, sfDir, "bands")
    assert(removed >= 1, "GC removed nothing despite a superseded layer")
    val current = Curation.resolveSnapshot(root)
    assert(layers() === Seq(current),
      s"GC left the wrong layers: ${layers()} (current: $current)")
    assert(spark.table(tbl).count() === rows0,
      "rows changed across GC — the committed layer was touched")
  }

  test("cross-session re-registration reuses the sidecar DDL: schema, bucket spec, rows identical (ADVICE r18)") {
    // The fresh-session branch of ensureTable: the table vanishes from
    // the catalog (a new JVM, or here an explicit metadata drop — both
    // tables are EXTERNAL, files untouched) and the next accessor must
    // re-register the committed layer from the _schema.ddl sidecar
    // captured at write time — NOT re-infer it from parquet, which
    // would flip every column nullable (the r18 ADVICE drift).
    def bucketSpec(tbl: String): String =
      spark.sql(s"DESCRIBE FORMATTED $tbl").collect()
        .filter(r => Seq("Num Buckets", "Bucket Columns", "Sort Columns")
          .contains(r.getString(0)))
        .map(r => s"${r.getString(0)}=${r.getString(1)}").sorted.mkString("|")
    val tbl = SketchStore.tableNames(sfDir)("simchunks")
    SketchStore.simChunks(spark, sfDir)
    val schema1 = spark.table(tbl).schema
    val spec1 = bucketSpec(tbl)
    val rows1 = spark.table(tbl).count()
    spark.sql(s"DROP TABLE $tbl") // metadata only: external table
    SketchStore.simChunks(spark, sfDir) // exercises the re-register branch
    assert(spark.table(tbl).schema === schema1,
      s"re-registered schema drifted:\n was: $schema1\n now: ${spark.table(tbl).schema}")
    assert(bucketSpec(tbl) === spec1, "re-registered bucket spec drifted")
    assert(spark.table(tbl).count() === rows1)
  }

  test("q203: the range read prunes shard directories at listing time — only the probed shards are scanned") {
    // The export's SERVE contract: a trainer fetching a slice of shards
    // 3/7/11 must list exactly those directories (PartitionFilters on
    // the shard column), never scan-and-filter the corpus — at 100 TB
    // this is the difference between O(slice) and O(export).
    Curation.ensureShardExport(spark, sfDir)
    val plan = Registry.byName("q203_export_range_read").build(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("shard"),
      s"q203: no partition filter on the shard column:\n$plan")
    val pf = plan.split("\n").find(_.contains("PartitionFilters")).get
    assert(pf.contains("shard"),
      s"q203: PartitionFilters does not prune on shard:\n$pf")
    // the data filter on ord pushes to parquet alongside
    assert(plan.contains("PushedFilters") && plan.contains("ord"),
      s"q203: ord range not pushed to the parquet scan:\n$plan")
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete(); ()
  }

  private def sketchRoot(tbl: String): String =
    graft.BuildPaths.scratch(
      s"sketch_store/${graft.BuildPaths.dirKey(sfDir)}") + s"/$tbl"

  private def layersOf(root: String): Seq[String] =
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("layer-"))
      .map(_.getName).toSeq.sorted

  test("refresh-path GC is retention-guarded: layers cap at current + N, the pre-refresh reader survives one generation (VERDICT r19 #3)") {
    // The lifecycle wiring the manual gcSupersededLayers was missing:
    // every refreshTable now collects layers more than GcRetainSuperseded
    // generations old. Reader horizon: a reader that resolved just
    // before a refresh keeps its (immediately superseded) layer; only a
    // SECOND refresh collects it.
    import graft.Tables
    val tbl = SketchStore.tableNames(sfDir)("bands")
    SketchStore.bands(spark, sfDir)
    val root = sketchRoot(tbl)
    val l0 = Curation.resolveSnapshot(root)
    // an interleaved reader resolved BEFORE the refresh (what a
    // mid-scan executor holds at 100 TB)
    val reader0 = spark.read.parquet(s"$root/$l0")
    val rows = reader0.count()
    def identityRefresh(): Unit = {
      SketchStore.refreshTable(spark, sfDir, "bands", Seq("band", "key")) {
        SketchStore.bandRowsOf(spark, Tables.load(spark, sfDir, "documents"))
      }; ()
    }
    identityRefresh()
    val l1 = Curation.resolveSnapshot(root)
    assert(l1 !== l0, "refresh did not commit a new layer")
    assert(layersOf(root).size <= 1 + SketchStore.GcRetainSuperseded,
      s"refresh-path GC left too many layers: ${layersOf(root)}")
    assert(layersOf(root).contains(l0),
      "the immediately-superseded layer must survive one refresh (reader horizon)")
    // the reader interleaved across fold+GC still reads its snapshot
    assert(reader0.count() === rows,
      "a reader one generation behind lost its layer to the refresh GC")
    identityRefresh()
    assert(!layersOf(root).contains(l0),
      s"a layer two generations old must be collected: ${layersOf(root)}")
    assert(layersOf(root).contains(l1),
      "the newest superseded layer must survive (retention lease)")
    assert(layersOf(root).size <= 1 + SketchStore.GcRetainSuperseded,
      s"GC cap violated after second refresh: ${layersOf(root)}")
    assert(spark.table(tbl).count() === rows,
      "identity refreshes changed row content")
  }

  test("chaos: a crash between the fold and the ledger (pointer, no log) wipes the partial artifact and reruns (VERDICT r19 #7)") {
    // The q248 recovery rule, actually exercised: the bands-compaction
    // lifecycle's commit marker is the LEDGER (_SUCCESS in logDir); the
    // fold's pointer flip lands BEFORE it. A death in that window
    // leaves a committed-looking bandsc layer with no ledger — adopting
    // it would silently serve the folded layer as the "base" of a
    // second fold. The documented recovery wipes and reruns; this pin
    // simulates the crash state and asserts the rerun actually happens
    // (fresh layer, re-written ledger, identical content).
    val (tbl, logDir) = SketchStore.ensureCompactedBands(spark, sfDir)
    val rows = spark.table(tbl).count()
    val root = sketchRoot(tbl)
    val layerBefore = Curation.resolveSnapshot(root)
    // the crash: ledger never landed...
    deleteRec(new java.io.File(logDir))
    // ...and a fresh session arrives (new JVM: memo gone, catalog gone)
    SketchStore.forgetLifecycle("bandsc_")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val (tbl2, logDir2) = SketchStore.ensureCompactedBands(spark, sfDir)
    assert(tbl2 === tbl)
    assert(new java.io.File(logDir2, "_SUCCESS").exists,
      "recovery did not rerun the lifecycle (no ledger)")
    assert(Curation.resolveSnapshot(root) !== layerBefore,
      "recovery adopted the orphaned mid-crash layer instead of wiping and rerunning")
    assert(spark.table(tbl2).count() === rows,
      "recovered fold content drifted from the pre-crash fold")
  }

  test("chaos: a completed lifecycle resumed by a fresh session re-registers the committed fold — the build thunk never fires") {
    // The other interleaving: ledger present = lifecycle complete. A
    // fresh session must re-register the committed layer from the
    // sidecar DDL and must NOT refold (the resume branch installs a
    // build thunk that THROWS if fired — reaching the assertions proves
    // it never ran).
    val (tbl, _) = SketchStore.ensureCompactedBands(spark, sfDir)
    val root = sketchRoot(tbl)
    val layer = Curation.resolveSnapshot(root)
    val rows = spark.table(tbl).count()
    SketchStore.forgetLifecycle("bandsc_")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val (tbl2, _) = SketchStore.ensureCompactedBands(spark, sfDir)
    assert(Curation.resolveSnapshot(root) === layer,
      "resume refolded (new layer) instead of re-registering the committed one")
    assert(spark.table(tbl2).count() === rows)
  }

  test("chaos: the tombstone-fold lifecycle (q258) recovers by the same ledger rule — wipe on pointer-without-ledger, re-register on complete") {
    // Both interleavings against the NEW grapht lifecycle. Interleaving
    // 1: ledger complete → fresh session re-registers, never refolds.
    val (tbl, logDir) = SketchStore.ensureTombstoneFoldedGraph(spark, sfDir)
    val root = sketchRoot(tbl)
    val layer = Curation.resolveSnapshot(root)
    val rows = spark.table(tbl).count()
    SketchStore.forgetLifecycle("grapht_")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val (tblR, _) = SketchStore.ensureTombstoneFoldedGraph(spark, sfDir)
    assert(Curation.resolveSnapshot(root) === layer,
      "grapht resume refolded instead of re-registering")
    assert(spark.table(tblR).count() === rows)
    // Interleaving 2: died between the fold's pointer flip and the
    // ledger → wipe and rerun to an identical fold.
    deleteRec(new java.io.File(logDir))
    SketchStore.forgetLifecycle("grapht_")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val (tbl2, logDir2) = SketchStore.ensureTombstoneFoldedGraph(spark, sfDir)
    assert(new java.io.File(logDir2, "_SUCCESS").exists,
      "grapht recovery did not rerun the lifecycle")
    assert(Curation.resolveSnapshot(root) !== layer,
      "grapht recovery adopted the orphaned layer instead of rerunning")
    assert(spark.table(tbl2).count() === rows,
      "recovered grapht fold drifted from the pre-crash fold")
    // the rerun's ledger replays identically (deterministic fold)
    val ledger = spark.read.parquet(logDir2).collect().head
    assert(ledger.getAs[Long]("tombs_after") === 0L)
    assert(ledger.getAs[Long]("n_degree_restored") === ledger.getAs[Long]("n_degraded"))
  }
}
