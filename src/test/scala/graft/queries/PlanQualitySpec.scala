package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.SparkTestSession

/** Plan-quality regression gate: the physical plans of the headline
  * queries must keep the properties that make them scale — filters
  * reaching the parquet scan, dimension sides broadcast, partial (map-
  * side) aggregation before the shuffle, no cartesian products outside
  * the deliberate cross-product query. A refactor that silently turns a
  * broadcast join into a shuffle join or lifts a filter off the scan
  * fails here, not in a 100x-slower production run.
  */
class PlanQualitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    graft.SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString

  /** The full-surface red-flag census, PINNED (the r17-verdict item 6
    * machine-gate): every query on the declared bench surface whose
    * executed plan carries a PlanAudit red flag, with its exact flag
    * set. Each entry is ACCOUNTED-BENIGN — `one-row` = a final global
    * aggregate/scalar over model- or certificate-sized data; `totals
    * window` = an unpartitioned window over a bounded (`<= buckets` /
    * per-partition-offset) table, documented at the operator
    * (Dsir.scala:42, ScaleOps.prefixSum); `chained-cross` = the
    * reference's own chained-cross semantics (cb_*). A NEW flag — or a
    * vanished one — fails this spec: re-account it here (with its
    * benign class) or fix the plan, never let it land silently. */
  private val PinnedRedFlags: Map[String, Set[String]] = Map(
    // chained-cross / LocalRelation param attaches (reference semantics)
    "cb_chained_cross" -> Set("BroadcastNestedLoopJoin"),
    "cb_groupby_2d" -> Set("BroadcastNestedLoopJoin"),
    "cb_reduce_dim" -> Set("BroadcastNestedLoopJoin"),
    // one-row final global reduce/materialization (metadata-scale)
    "cb_reduce_all" -> Set("Exchange SinglePartition"),
    "cb_setitem_splice" -> Set("Exchange SinglePartition"),
    "cb_tasktable" -> Set("Exchange SinglePartition"),
    // one-row final scalar aggregates (the TPC-H single-value answers)
    "q14_promo_share" -> Set("Exchange SinglePartition"),
    "q15_top_supplier" -> Set("Exchange SinglePartition"),
    "q17_small_qty_revenue" -> Set("Exchange SinglePartition"),
    "q19_bracket_revenue" -> Set("Exchange SinglePartition"),
    "q6_forecast" -> Set("Exchange SinglePartition"),
    "q22_idle_rich" -> Set("BroadcastNestedLoopJoin",
      "Exchange SinglePartition"), // scalar-average attach + final row
    "q_lm_perplexity" -> Set("BroadcastNestedLoopJoin",
      "Exchange SinglePartition"), // corpus-LM scalar attach + final row
    // bounded totals windows / per-partition offset tables
    // (Dsir.scala:42-44, ScaleOps.prefixSum:172 — data-sized work stays
    // partition-local; the single partition carries <= buckets rows)
    "q_dsir_select" -> Set("Exchange SinglePartition"),
    "q_dsir_select_xx" -> Set("Exchange SinglePartition"),
    "q_mix_sample" -> Set("Exchange SinglePartition"),
    "q_seq_pack" -> Set("Exchange SinglePartition"),
    "q_classifier_curation" -> Set("Exchange SinglePartition"),
    "q_curation_pipeline" -> Set("Exchange SinglePartition"),
    // one-row certificate/profile finals
    "q_knn_join" -> Set("Exchange SinglePartition"),
    "q_multimodal_pipeline" -> Set("Exchange SinglePartition"),
    "q_profile" -> Set("Exchange SinglePartition"),
    "q_repeat_recall" -> Set("BroadcastNestedLoopJoin",
      "Exchange SinglePartition"), // guardCertScale's one-row broadcast
    // guard (the structural pre-scan raise) + its global count
    "q_scrub_recall" -> Set("BroadcastNestedLoopJoin",
      "Exchange SinglePartition"), // the same guardCertScale classes
    // (two guarded exactRepeats runs: truth + residual) + 3-row final
    "q_semdedup" -> Set("Exchange SinglePartition"),
    "q_simhash_complete" -> Set("Exchange SinglePartition"),
    "q_sketch_distinct" -> Set("Exchange SinglePartition"),
    "q_text_bm25" -> Set("Exchange SinglePartition"),
    "q_validate" -> Set("Exchange SinglePartition"))

  test("full-surface red-flag census equals the pinned accounted-benign set") {
    val got = graft.SparkEntry.defs.flatMap { d =>
      val plan = d.fn(spark, dir).queryExecution.executedPlan.toString
      val flags = graft.tools.PlanAudit.redFlags(d.name, plan)
      if (flags.isEmpty) None else Some(d.name -> flags.toSet)
    }.toMap
    val fresh = got.keySet -- PinnedRedFlags.keySet
    val vanished = PinnedRedFlags.keySet -- got.keySet
    val changed = (got.keySet & PinnedRedFlags.keySet)
      .filter(k => got(k) != PinnedRedFlags(k))
    assert(fresh.isEmpty && vanished.isEmpty && changed.isEmpty,
      s"red-flag census drifted from the pin —\n" +
        s"  FRESH (account or fix): ${fresh.toSeq.sorted.map(k => s"$k=${got(k)}")}\n" +
        s"  VANISHED (update pin): ${vanished.toSeq.sorted}\n" +
        s"  CHANGED: ${changed.toSeq.sorted.map(k => s"$k ${PinnedRedFlags(k)} -> ${got(k)}")}")
  }

  test("q1: filter pushed to the lineitem scan; two-phase aggregation") {
    val plan = planOf("q1_pricing")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"shipdate filter not pushed:\n${plan.take(800)}")
    // partial + final hash aggregation (map-side combine before shuffle)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, "no two-phase aggregation")
  }

  test("q3: dimension side broadcast; fact filters pushed") {
    val plan = planOf("q3_shipping")
    assert(plan.contains("BroadcastHashJoin"), "customer side not broadcast")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      plan.contains("GreaterThan(l_shipdate"), "lineitem filter not pushed")
  }

  test("q5: all dimension joins broadcast, no cartesian product") {
    val plan = planOf("q5_region_revenue")
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("q21 shape: one join + one order-keyed window, dims broadcast") {
    val plan = planOf("q21_suppliers_kept_waiting")
    // r21 rewrite: the EXISTS / NOT EXISTS pair is computed by ONE
    // window over the lineitem⋈orders join's own l_orderkey
    // partitioning — the semi/anti self-joins (which re-planned the
    // lineitem⋈orders join and scanned a third lineitem instance) are
    // gone, and with them their exchanges
    assert(!plan.contains("LeftSemi") && !plan.contains("LeftAnti"),
      "q21 still plans the semi/anti self-joins the window replaced")
    assert(plan.contains("Window"), "existence tests not a window pass")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), "q21 plans a cross/NL join")
    // exactly ONE lineitem scan feeds the query (the old shape had three)
    assert("lineitem\\.parquet".r.findAllIn(plan).size == 1,
      "more than one lineitem scan")
    // the nation-filtered supplier dim reaches the survivors as a broadcast
    assert(plan.contains("BroadcastHashJoin"), "supplier dim not broadcast")
    // every shuffle is order-keyed (the join + window share it) or the
    // final supplier-name aggregation — no shuffle on any other key
    val exchanges = "Exchange hashpartitioning\\(([a-z0-9#_]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    val allowed = (k: String) => k.startsWith("l_orderkey") ||
      k.startsWith("s_name")
    assert(exchanges.nonEmpty && exchanges.forall(allowed),
      s"unexpected shuffle keys: $exchanges")
  }

  test("q4 shape: EXISTS late-line probe is a semi join, no stray shuffles") {
    val plan = planOf("q4_priority_late")
    assert(plan.contains("LeftSemi"), s"EXISTS not a semi join:\n${plan.take(800)}")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), "q4 plans a cross/NL join")
    // shuffles only on the order key (probe co-location; a broadcast
    // side needs none) or the tiny priority aggregate
    val exchanges = "Exchange hashpartitioning\\(([a-z0-9#_]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(exchanges.forall(k => k.startsWith("o_orderkey") ||
      k.startsWith("l_orderkey") || k.startsWith("o_orderpriority")),
      s"unexpected shuffle keys: $exchanges")
  }

  test("q9 shape: part filter and nation broadcast onto the probe side") {
    val plan = planOf("q9_profit_shape")
    // the name-filtered part dim and nation must both reach lineitem as
    // broadcasts — a shuffle of the fact on p_partkey would be the
    // classic 100-TB mistake
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"part/nation dims not broadcast:\n${plan.take(1200)}")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), "q9 plans a cross/NL join")
    val exchanges = "Exchange hashpartitioning\\(([a-z0-9#_]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(exchanges.forall(k => k.startsWith("l_orderkey") ||
      k.startsWith("o_orderkey") || k.startsWith("l_suppkey") ||
      k.startsWith("s_suppkey") || k.startsWith("n_name")),
      s"unexpected shuffle keys: $exchanges")
  }

  test("q18: order-quantity HAVING aggregates before any join") {
    val plan = planOf("q18_large_volume")
    // the lineitem groupBy + filter must run before the orders join: the
    // join probe is the QUALIFYING orders only. In the physical plan the
    // first operator above the lineitem scan chain is the partial
    // HashAggregate, not a join build
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      "lineitem scan not pruned to (orderkey, quantity)")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), "q18 plans a cross/NL join")
    // the HAVING runs against the aggregate output (a Filter on sum_qty
    // directly over the final HashAggregate — i.e. BEFORE any join
    // consumes it; with a 2-column pruned lineitem scan the joins can
    // only ever see the aggregated orders)
    assert("Filter [^\\n]*sum_qty[^\\n]*\\n[^\\n]*HashAggregate".r
      .findFirstIn(plan).isDefined,
      s"sum_qty filter not directly over the aggregate:\n${plan.take(1500)}")
    // shuffles only on the order/customer join keys or the aggregate key
    val exchanges = "Exchange hashpartitioning\\(([a-z0-9#_]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(exchanges.forall(k => k.startsWith("l_orderkey") ||
      k.startsWith("o_orderkey") || k.startsWith("o_custkey") ||
      k.startsWith("c_custkey")), s"unexpected shuffle keys: $exchanges")
  }

  test("q22: scalar average broadcasts as one row; no-recent-order probe is anti") {
    val plan = planOf("q22_idle_rich")
    assert(plan.contains("LeftAnti"), s"NOT EXISTS not an anti join:\n${plan.take(800)}")
    // the single-row average crosses via a broadcast nested-loop join —
    // the ONLY acceptable NL join: its build side is exactly one row
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "scalar threshold should ride a 1-row broadcast")
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size == 1,
      "more than one NL join — only the 1-row scalar broadcast is allowed")
  }

  test("scans prune columns: projection reaches ReadSchema") {
    val plan = planOf("q6_forecast")
    // only the filtered/aggregated columns are read, not the whole row
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(readSchema.nonEmpty && !readSchema.contains("l_comment"),
      s"scan reads unpruned schema: $readSchema")
  }

  test("cb queries: the only cartesian product is the deliberate one") {
    val cross = planOf("cb_chained_cross")
    assert(cross.contains("CartesianProduct") || cross.contains("BroadcastNestedLoopJoin"),
      "chained-map cross product should plan as a cross join")
    Seq("cb_groupby_sum", "cb_groupby_chained", "cb_slice_pos", "cb_map_2d")
      .foreach { q =>
        val plan = planOf(q)
        assert(!plan.contains("CartesianProduct"), s"$q plans a cartesian product")
      }
  }

  test("dedup family: lazy plans carry no scale red flags") {
    // the public pipelines checkpoint their results (the executed plan a
    // consumer sees is a LogicalRDD scan), so the gate audits the lazy
    // *Plan builders — the actual dataflow that runs at scale. A refactor
    // reintroducing an uncapped self-join would surface as a cartesian /
    // nested-loop join or a single-partition exchange here.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val scope = new graft.operators.Dedup.CacheScope
    try {
      val plans = Seq(
        "minhash" -> graft.operators.Dedup.minhashNearDupsPlan(scope, docs,
          "doc_id", "text", 0.5, 8, 4, 3, 64),
        "ngram" -> graft.operators.Dedup.minhashNearDupsPlan(scope, docs,
          "doc_id", "text", 0.3, 16, 2, 3, 64),
        "simhash" -> graft.operators.Dedup.simhashCandidatesPlan(scope, docs,
          "doc_id", "text", 64),
        "simhashMd5" -> graft.operators.Dedup.simhashCandidatesMd5Plan(scope,
          docs, "doc_id", "text", 64),
        "cosine" -> graft.operators.Dedup.cosineNearDupsPlan(scope, emb,
          "vec_id", "embedding", 64, 0.4, 4, 8, 256, 42L),
        // the two production-only xx pipelines that carry bench floors but
        // no oracle pair-row (their correctness rows are differential
        // certificates): a refactor must not reintroduce an uncapped join
        // or a funnel on a path only the bench exercises
        "embedXx" -> graft.operators.Dedup.cosineNearDupsPlan(scope,
          graft.operators.TextAnalysis.hashEmbed(docs, "doc_id", "text",
            dim = 256, n = 2), "doc_id", "vec", 256, 0.6, 4, 8, 256, 42L),
        "streamXx" -> graft.streaming.StreamDedup.nearDupHits(
          docs.withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros(
              (org.apache.spark.sql.functions.col("doc_id") + 10000L)
                * 1000000L)),
          "doc_id", "ts", "text", threshold = 0.5))
      plans.foreach { case (n, df) =>
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"), s"$n plans a cartesian product")
        assert(!plan.contains("BroadcastNestedLoopJoin"), s"$n plans a nested-loop join")
        assert(!plan.contains("Exchange SinglePartition"),
          s"$n funnels through a single partition")
        // both simhash modes must compute the signature with the native
        // per-row kernel IN THE SCAN STAGE (since r12 the md5 twin runs
        // the production kernel with the token hash swapped): the plan
        // carries `graft_simhash`, and the only Generate nodes are the
        // 4-chunk banding of the already-computed signature — a refactor
        // back to a relational vote (or any design that explodes raw
        // tokens) would ship every token row across an exchange before
        // banding, which is exactly the scale flaw the kernel removed
        if (n == "simhashMd5" || n == "simhash") {
          assert(plan.contains("graft_simhash"),
            s"$n signature not computed by the native kernel in the scan stage")
          val gens = "Generate [^\n]*".r.findAllIn(plan).toList
          assert(gens.nonEmpty && gens.forall(_.contains("shiftright")),
            s"$n explodes something other than the 4 signature chunks:\n" +
              gens.mkString("\n"))
        }
        // the stream path's only shuffle is the (band, bucket)-keyed group
        // exchange into the bounded-bucket stateful fold (batch execution
        // plans flatMapGroupsWithState as MapGroups) — a global or unkeyed
        // formulation would funnel the corpus through one task, and the
        // signature must come from the scan-stage kernel, never a
        // per-band recompute
        if (n == "streamXx") {
          assert(plan.contains("MapGroups") ||
            plan.contains("FlatMapGroupsWithState"),
            s"$n lost its keyed stateful fold")
          assert("Exchange ".r.findAllIn(plan).size == 1 &&
            plan.contains("Exchange hashpartitioning"),
            s"$n should shuffle exactly once, keyed:\n${plan.take(900)}")
          assert(plan.contains("graft_minhash_from_hashes"),
            s"$n signature not computed by the native kernel")
          val gens = "Generate [^\n]*".r.findAllIn(plan).toList
          assert(gens.nonEmpty && gens.forall(_.contains("slice(sig")),
            s"$n explodes something other than signature bands:\n" +
              gens.mkString("\n"))
        }
      }
    } finally scope.release()
  }

  test("differential certificates: the only joins are the scalar " +
      "assembly of one-row aggregates") {
    // the q_*_xx correctness rows assemble global (no-group-key)
    // aggregates with crossJoins — each side is ONE row by construction,
    // so the nested-loop joins and single-partition finals PlanAudit
    // flags on them are structurally benign. This pins that shape per
    // certificate: the 5-way count assembly (4 NL joins) plus the scale
    // guard, which since r15 is threaded through the INPUT of every
    // expensive branch (Differential.guardInput — the over-cap raise
    // must be a broadcast DEPENDENCY of the quadratic scan, not a
    // racing sibling job): the guarded ground-truth subtree appears
    // once per consumer (self-join side a, side b; n(exact); caught),
    // each instance one more one-row guard BNLJ. Simhash adds the r14
    // twin_sig_agreement term; dsir's three-contract assembly is 5.
    // More NL joins than the declared assembly (or any cartesian over
    // data) means a refactor introduced a real join
    Seq("q_dedup_minhash_xx" -> 9, "q_dedup_simhash_xx" -> 10,
      "q_embed_neardup_xx" -> 9, "q_stream_neardup_xx" -> 9,
      "q_simhash_complete" -> 8, "q_dsir_select_xx" -> 5)
      .foreach { case (q, maxNl) =>
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val nl = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
      assert(nl <= maxNl,
        s"$q: $nl nested-loop joins — scalar assembly is at most $maxNl")
      assert(!plan.contains("CartesianProduct"), s"$q plans a cartesian product")
      assert(df.count() == 1, s"$q certificate must be exactly one row")
    }
  }

  test("knn join: broadcast query side, bounded-heap partial aggregation") {
    val plan = planOf("q_knn_join")
    // the query set is broadcast (never shuffles the corpus against it)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query side not broadcast:\n${plan.take(900)}")
    // map-side partial heaps: only k pairs per (partition, query) shuffle
    assert(plan.contains("partial_graft_topk_pairs"),
      "top-k aggregation lost its map-side partial phase")
    // scans are pruned to id + vector
    assert(!plan.contains("label"), "embeddings scan reads unused columns")
  }

  test("quality rules / url queries stay narrow: one scan, pruned columns") {
    val rules = planOf("q_quality_rules")
    assert("FileScan parquet".r.findAllIn(rules).size == 1,
      "quality rules should be a single-scan query")
    assert(rules.contains("ReadSchema: struct<text:string,lang:string>") ||
      rules.contains("ReadSchema: struct<lang:string,text:string>"),
      s"rule scan not pruned to (text, lang):\n${rules.take(600)}")
    val hosts = planOf("q_url_hosts")
    assert("FileScan parquet".r.findAllIn(hosts).size == 1 &&
      "HashAggregate".r.findAllIn(hosts).size >= 2,
      "url rollup lost its single-scan two-phase shape")
  }

  test("quota/mix samples: every rank phase partitions on the stratum " +
      "(no global window)") {
    // structural check on the executed plan: every WindowExec must carry a
    // non-empty partitionSpec — an unpartitioned rank would funnel the
    // whole input through one task (the exact trap the two-phase design
    // avoids)
    // (logical plan: AQE hides the physical WindowExec nodes until run)
    Seq("q_quota_sample", "q_mix_sample", "q_cluster_balance").foreach { q =>
      val logical = graft.SparkEntry.queries(q)(spark, dir)
        .queryExecution.optimizedPlan
      val windows = logical.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
      def isRank(w: org.apache.spark.sql.catalyst.plans.logical.Window) =
        w.windowExpressions.exists(_.find {
          case _: org.apache.spark.sql.catalyst.expressions.RowNumber => true
          case _ => false
        }.isDefined)
      val (ranks, others) = windows.partition(isRank)
      assert(ranks.size >= 2, s"$q: expected two rank phases, got ${ranks.size}")
      ranks.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"$q: unpartitioned RANK window (corpus-sized funnel):\n$w"))
      // the only allowed unpartitioned window is the mix sampler's
      // quota-total sum, which runs over the |domains|-row counts
      // aggregate (bounded by construction, the prefixSum-totals class)
      others.foreach { w =>
        if (w.partitionSpec.isEmpty)
          assert(w.child.find {
            case _: org.apache.spark.sql.catalyst.plans.logical.Aggregate => true
            case _ => false
          }.isDefined,
            s"$q: unpartitioned non-rank window over a non-aggregated child:\n$w")
      }
    }
  }

  test("co-grouped groupby keeps the pruned parquet scan (no RDD fallback)") {
    // the common case — key co-grouped with the reduced pred — must scan
    // parquet with only the needed columns: positional-label
    // materialization (zipWithIndex -> Scan ExistingRDD, all columns)
    // on this path is a scale regression
    val plan = planOf("cb_groupby_sum")
    assert(plan.contains("Scan parquet"), s"RDD scan fallback:\n${plan.take(600)}")
    assert(!plan.contains("ExistingRDD"), "positional labels materialized needlessly")
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(readSchema.contains("l_quantity") && !readSchema.contains("l_comment"),
      s"unpruned scan: $readSchema")
  }

  test("native as-of join: dedicated operator, one exchange per side") {
    val plan = planOf("q_events_asof_native")
    assert(plan.contains("AsOfJoin"), s"custom operator not planned:\n${plan.take(600)}")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges == 2, s"expected 2 hash exchanges, got $hashExchanges:\n$plan")
  }

  test("native as-of join reuses a compatible upstream partitioning") {
    // inputs already hash-clustered on the join key satisfy the operator's
    // ClusteredDistribution — EnsureRequirements must not add exchanges
    import org.apache.spark.sql.functions.col
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts").repartition(4, col("user_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("p_id"))
      .repartition(4, col("user_id"))
    val out = graft.operators.AsOfJoin.native(clicks, purchases,
      Seq("user_id"), "ts", "ts", Map("p_event" -> "p_id"))
    val plan = out.queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges == 2,
      s"extra exchange above the pre-clustered inputs ($hashExchanges):\n$plan")
    // and the self-derived (shared-relation) inputs execute correctly:
    // same result as the composed formulation
    val composed = graft.operators.AsOfJoin(clicks, purchases,
      Seq("user_id"), "ts", "ts", Map("p_event" -> "p_id"))
    val key = (r: org.apache.spark.sql.Row) => r.getLong(0)
    val got = out.collect().map(r => key(r) -> r.toSeq).toMap
    val want = composed.collect().map(r => key(r) -> r.toSeq).toMap
    assert(got == want, "native result differs from composed on shared-relation inputs")
  }

  test("cosine verify pays one dot per pair: norms stay hoisted on the " +
      "join input sides") {
    // regression gate for the norm hoist (commit 26e9704): the pair
    // verify's cosine projection must reference the pre-computed __na/
    // __nb scalars, never recompute sqrt(dot(v,v)) per candidate pair —
    // that was 3x the verify FLOPs across millions of capped candidates.
    // The declared query seals through an eager checkpoint (its plan is
    // a LogicalRDD), so gate the LAZY plan builder the query runs.
    val scope = new graft.operators.Dedup.CacheScope
    val plan = try graft.operators.Dedup.cosineNearDupsPlan(scope,
        spark.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding", dim = 64, threshold = 0.4,
        planesPerTable = 4, tables = 8, maxBucket = 256, seed = 42L)
      .queryExecution.optimizedPlan.toString
      finally scope.release()
    val verifyLines = plan.linesIterator
      .filter(l => l.contains("cosine") && l.contains("graft_dot")).toSeq
    assert(verifyLines.nonEmpty, "no cosine verify projection found")
    verifyLines.foreach { l =>
      val dots = "graft_dot".r.findAllIn(l).size
      assert(dots <= 1,
        s"cosine verify recomputes norms per pair ($dots dots in one " +
          s"projection):\n${l.take(400)}")
    }
    assert(plan.contains("__na") && plan.contains("__nb"),
      "hoisted norm columns missing from the verify plan")
  }

  test("md5 stream-dedup keeps its staging barrier (no md5/conv above " +
      "the checkpoint)") {
    // regression gate for the 24x wall blow-up of commit 5b8f194: the
    // md5-half conversions in minhashSigMd5Frame are protected from a
    // CollapseProject per-position inline ONLY by the `sh` double
    // reference below an eager-checkpoint barrier. If the stage() is
    // ever removed, the hash expressions resurface in the operator's
    // optimized plan (they currently all execute inside the barrier
    // and the plan above it starts from a LogicalRDD).
    val plan = planOf("q_stream_neardup")
    assert(!plan.contains("md5(") && !plan.contains("conv("),
      "md5/conv hash expressions above the staging barrier — the " +
        s"eager checkpoint in StreamDedup md5Mode is gone:\n${plan.take(1200)}")
    // and the barrier really is there: the banded scan reads a
    // materialized RDD, not the raw documents parquet
    assert(plan.contains("Scan ExistingRDD") || plan.contains("LogicalRDD"),
      s"no checkpoint barrier in the md5 stream-dedup plan:\n${plan.take(1200)}")
  }

  test("dsir: broadcast scoring join, top-k cut, totals window only over " +
      "the bucket aggregate (both hash modes)") {
    for (name <- Seq("q_dsir_select", "q_dsir_select_xx"))
      checkDsirPlan(name)
  }

  private def checkDsirPlan(name: String): Unit = {
    // the xx row's BENCH fn is the production pipeline itself (its
    // verify surface is the certificate); plan-gate the raw fn here
    val q = graft.SparkEntry.defs.find(_.name == name).get.fn(spark, dir)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs crept into dsir:\n${plan.take(1200)}")
    // the <= buckets-row log-ratio table must broadcast onto the staged
    // counts — a shuffled scoring join would re-exchange the corpus-sized
    // side on the bucket key (skewed: common-token buckets are huge)
    assert(plan.contains("BroadcastHashJoin"),
      s"log-ratio table not broadcast:\n${plan.take(1200)}")
    assert(plan.contains("TakeOrderedAndProject"),
      s"selection cut is not a top-k (global sort?):\n${plan.take(1200)}")
    // feature counts are staged once (eager checkpoint): the plan above
    // the barrier starts from a materialized RDD, and the md5 bucket
    // hash runs inside it, never above
    assert(plan.contains("Scan ExistingRDD") || plan.contains("LogicalRDD"),
      s"no staging barrier above the feature counts:\n${plan.take(1200)}")
    assert(!plan.contains("md5(") && !plan.contains("xxhash64("),
      s"bucket hashing above the staging barrier:\n${plan.take(1200)}")
    // the only unpartitioned window is the totals sum over the bucket
    // aggregate (bounded by construction, the prefixSum-totals class)
    val windows = q.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty, "expected the bucket-frame totals window")
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.child.find {
        case _: org.apache.spark.sql.catalyst.plans.logical.Aggregate => true
        case _ => false
      }.isDefined,
        s"unpartitioned window over a non-aggregated child:\n$w")
    }
  }
}
