package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** The cartesian/broadcast house rule, automated (the twin of
  * [[WindowLint]]): a `BroadcastNestedLoopJoin` or `CartesianProduct`
  * is legal ONLY when its build side (both sides, for a cartesian) is
  * bounded by something other than the data — a global aggregate
  * (1 row), a limit/TakeOrdered shortlist, or a driver-held literal
  * model. An unbounded build side is the all-pairs blowup that turns a
  * 100 TB scan into |stream|×|build| comparisons.
  *
  * [[boundedByConstruction]] proves the common cases structurally from
  * the physical plan; a site the prover can't certify needs an
  * [[allowedCross]] entry NAMING the bound (same contract as
  * `WindowLint.allowedSingleton` — "doc-bounded"/"node-bounded" do not
  * qualify). [[QueriesSmokeSpec]] runs the detector over every harness
  * query's physical plan; [[JoinLintSpec]] fixture-proves the detector
  * and prunes stale allowlist entries.
  */
object JoinLint {

  /** True when `p`'s row count is bounded by construction:
    * grouping-free aggregates emit exactly 1 row, limits emit ≤ k,
    * local relations are driver-held models, and narrow/unary nodes
    * (project/filter/sort/exchange/codegen) preserve their child's
    * bound. Joins/unions of bounded inputs stay bounded. Everything
    * else — scans in particular — is data-sized.
    */
  def boundedByConstruction(p: SparkPlan): Boolean = p match {
    // row-EXPANDING nodes void their child's bound: explode over a
    // grouping-free aggregate is 1 row × an array of data-sized length
    // (e.g. explode(collect_list(x))) — exactly the blowup this lint
    // exists to catch. The one provable exception: a generator whose
    // inputs are all FOLDABLE (a literal array / literal-bounds
    // sequence) multiplies the child's bound by a compile-time
    // constant, so it preserves boundedness. Anything data-dependent
    // (collect_list, sequence(0, n)) needs an allowlist entry naming
    // the bound.
    case g: GenerateExec =>
      g.generator.children.forall(_.foldable) && boundedByConstruction(g.child)
    case a: HashAggregateExec if a.groupingExpressions.isEmpty => true
    case a: ObjectHashAggregateExec if a.groupingExpressions.isEmpty => true
    case a: SortAggregateExec if a.groupingExpressions.isEmpty => true
    case _: LocalTableScanExec => true
    case _: RangeExec => true // literal start/end — bounded by construction
    case _: GlobalLimitExec => true
    case _: CollectLimitExec => true
    case _: TakeOrderedAndProjectExec => true
    case other if other.children.nonEmpty =>
      other.children.forall(boundedByConstruction)
    case _ => false
  }

  /** Offending nodes in `df`'s physical plan: BNLJ whose build side is
    * not provably bounded, and cartesian products where neither side
    * is. Returns one description per site (empty = clean).
    */
  def unboundedCrossSites(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.sparkPlan
    plan.collect {
      case j: BroadcastNestedLoopJoinExec =>
        val build = j.buildSide match {
          case BuildLeft => j.left
          case BuildRight => j.right
        }
        if (boundedByConstruction(build)) None
        else Some(s"BroadcastNestedLoopJoin(${j.joinType}) with unbounded build side ${build.nodeName}")
      case c: CartesianProductExec =>
        if (boundedByConstruction(c.left) || boundedByConstruction(c.right)) None
        else Some(s"CartesianProduct of two unbounded sides (${c.left.nodeName} × ${c.right.nodeName})")
    }.flatten
  }

  /** Queries ALLOWED an unproven cross site, each with its bound stated
    * (and restated in the query's Scaladoc). Eligible bounds are the
    * WindowLint ones: calendar, value-support, model/shortlist, grid.
    */
  val allowedCross: Map[String, String] = Map(
    // (exactly the queries JoinLintSweep observes an unproven site in —
    // QueriesSmokeSpec fails any new name; JoinLintSpec prunes stale
    // entries. Bounds are restated from each query's Scaladoc.)
    // -- calendar-bounded build sides (day/month/hour spine ≤ a few
    //    hundred rows at ANY data size; pairwise forms are calendar²)
    "q_hodges_lehmann" -> "weekday×weekend day-pair differences (calendar²)",
    "q_jackknife_ratio" -> "leave-one-region-out strata (5 regions, value-support)",
    "q_kendall_tau" -> "d1<d2 day-pair self-join (calendar²; documented in Scaladoc)",
    "q_mann_kendall" -> "all-day-pairs S statistic (calendar²; documented tiny)",
    "q_theil_sen" -> "pairwise day slopes (calendar²; 29%-breakdown median)",
    "q_var_es" -> "daily loss histogram (calendar-bounded value support)",
    // -- probe/eval-shortlist-bounded build sides (fixed ≤500-row probe
    //    or model side broadcast against one linear corpus pass)
    "q_ann_ivf" -> "centroid model (k-means, ≤16 rows; the probe slice itself is a proven TakeOrdered since r13)",
    "q_ann_ivfpq" -> "broadcast coarse-centroid/LUT model (memo-checkpointed, ≤ncells·ksub rows; probe slice proven r13)",
    "q_ann_ivfpq_pruned" -> "broadcast centroid/LUT model over the ivf_cell-pruned lake (probe slice proven r13)",
    "q_ann_ivfpq_refine" -> "broadcast centroid/LUT model; refine over per-query ≤12-row shortlists (probe slice proven r13)",
    "q_ann_pq_recall" -> "checkpointed codebook/centroid models across 4 PQ variants (probe slices proven r13)",
    // (q_decontaminate_embed and q_knn_cosine were pruned r12, and the
    // whole probe/eval-slice family — mrr/ndcg/err/map_at_k/confusion/
    // silhouette/knn_class/knn_impute/ann_hamming(+refine)/ann_recall/
    // ann_quant_recall/ngram_jaccard — r13: every probe slice became a
    // filter+TakeOrdered (probeSlice), provable structurally. The ann
    // entries that REMAIN are flagged on their memo-CHECKPOINTED model
    // side (LogicalRDD erases the structural proof), not the probes.)
    "q_kcenter" -> "k broadcast center rows × linear corpus passes (k passes)",
    "q_ransac" -> "hash-ARGMIN-selected sample seeds broadcast per round",
    "q_edit_distance" -> "capped near-name candidate set (documented cap)",
    "q_lcs_sim" -> "probe-bounded journey pairs (first-7-event sequences)",
    "q_needleman" -> "probe-bounded 7-event journey pairs (bounded DP lattice)",
    "q_simhash_pairs" -> "capped document set for hamming pair verification (cap is TakeOrdered since r13, but the per-doc simhash grouping agg above a shingle Generate blocks the structural proof)",
    // -- value-support / grid-bounded build sides
    "q_chi2_indep" -> "lang×source contingency margins (value-support cells)",
    "q_chi2_residuals" -> "contingency margins (value-support cells)",
    "q_cramers_v" -> "contingency margins + scalar N (value-support)",
    "q_mutual_info" -> "5×7 type×day-of-week contingency (value-support)",
    "q_content_halflife" -> "40-article × day scaffold (both dims bounded, documented)",
    "q_benjamini_yekutieli" -> "5-hypothesis family rank self-join (value-support; the fdr_bh bound)",
    "q_fdr_bh" -> "5-hypothesis family × 200-round permutation grid",
    "q_fisher_exact" -> "hypergeometric k-support explode off the 1-row 2×2 margin aggregate (≤ |users|+1 rows; events users are fixed at 150 across SFs)",
    "q_friedman" -> "block×treatment rank grid (value-support)",
    "q_holm_bonferroni" -> "5-hypothesis family rank + step-down prefix self-joins (value-support; the fdr_bh bound)",
    "q_interaction_coverage" -> "per-user interaction-count support walk (value-support cumulative rank for q90)",
    "q_isotonic" ->"10-bucket rate table: PAVA max-min over bucket pairs (grid²)",
    "q_kmv_overlap" -> "per-source bottom-64 KMV sketches (64·sources rows)",
    "q_lsh_scurve" -> "capped 48-doc all-pairs probe (1128 pairs by construction; cap is TakeOrdered since r13 but the signature agg above the shingle Generate blocks the proof; production uses the band join)",
    "q_matching_att" -> "activity-level support match (distinct levels, bounded)",
    "q_meta_analysis" -> "5-region cell grid × the 1-row pooled/Q readout (group keys are the pool scalars)",
    "q_nb_classifier" -> "≤5·1024-row likelihood model broadcast (documented)",
    "q_shapley" -> "2⁴ coalition grid over 4 channels (model-bounded)",
    "q_slope_one" -> "5×5 event-type deviation matrix × probe users (value-support)",
    "q_tcloseness" -> "quasi-identifier groups × ordered sensitive support (EMD walk)",
    "q_tree2" -> "feature×value-support split grid (documented split search)",
    // -- API demos / replays
    "q_cross_join" -> "region×nation 5×25 fixed-cardinality dims (the cross-join API demo)",
    "q_dtw" -> "two calendar-bounded daily series in the DTW lattice",
  )
}

/** One-off sweep: prints every query whose physical plan carries an
  * unproven cross site. `sbt "Test/runMain graft.JoinLintSweep"`.
  */
object JoinLintSweep {
  def main(args: Array[String]): Unit = {
    val spark = GraftSpark.spark
    val sf = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val sites = JoinLint.unboundedCrossSites(fn(spark, sf))
        if (sites.nonEmpty)
          println(s"CROSS ${if (JoinLint.allowedCross.contains(name)) "allowed " else "VIOLATION"} $name: ${sites.mkString("; ")}")
      } catch {
        case e: Throwable => println(s"ERROR $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
