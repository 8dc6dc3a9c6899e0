package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph measures over edge tables.
  *
  * PageRank here is the fixed-iteration, declarative form: each power
  * iteration is one equi-join (edges ⋈ ranks on src) plus one aggregate
  * (sum of pushed mass by dst) — the classic "join-and-regroup" shape
  * that scales linearly in |E| per iteration and never materializes
  * anything denser than the edge list. Ranks are rounded per iteration
  * (same device as the unrolled k-means oracle) so a DuckDB oracle can
  * replay the identical arithmetic bit-for-bit.
  */
object Graph {

  /** Synchronous label propagation (community detection) with a fixed
    * iteration count — deterministic LPA: every node starts labeled
    * with itself; each round it adopts the label carrying the highest
    * total INTEGER edge weight among its neighbors, ties broken by
    * smallest label. Integer weights make the argmax exact (no float
    * boundary can flip a community), and the synchronous schedule makes
    * the result order-free — the two changes that turn the classically
    * nondeterministic LPA into an oracle-checkable operator.
    *
    * Scale shape: one round = one equi-join of the undirected edge list
    * against the O(|V|) label table (shuffle on dst) + one (src, label)
    * aggregate + one min-struct argmax per src — the pagerank
    * join-and-regroup cost, O(|E|) per round, nothing collected.
    *
    * @param edges (src, dst, w: long) directed edge list; symmetrized
    *              and parallel-summed internally.
    */
  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    val und = edges.select(col("src"), col("dst"), col("w"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
    var labels = und.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to iters) {
      labels = und.join(labels, und("dst") === labels("node"))
        .groupBy(col("src"), col("label")).agg(sum(col("w")).as("wt"))
        .groupBy(col("src"))
        .agg(min(struct((-col("wt")).as("nw"), col("label"))).as("best"))
        .select(col("src").as("node"), col("best.label").as("label"))
    }
    labels
  }

  /** Weighted PageRank with a fixed number of power iterations.
    *
    * @param edges (src: long, dst: long, w: double) weighted directed
    *              edges; parallel edges should be pre-aggregated.
    * @param iters unrolled iteration count (small, fixed — convergence
    *              detection would add a driver action per round).
    * @param mass  total rank mass. Kept at O(1k) so round-6 per-iteration
    *              quantization sits ~9 orders of magnitude above the
    *              accumulation-order noise floor of double sums — the
    *              property that makes the oracle comparable cross-engine.
    *
    * Scale notes (100 TB posture): the rank table is O(|V|) and the
    * per-iteration shuffle is O(|E|) on (src, then dst) — both stay
    * distributed; nothing is collected. Iterations chain lineage; a
    * production loop with many rounds would checkpoint the rank table
    * every few iterations (the CC loop in [[Dedup]] shows that pattern) —
    * at 3 unrolled rounds the re-derivation is cheaper than the write.
    * Dangling nodes (no out-edges) follow the simple convention: their
    * mass is not redistributed, only the damped base term reaches them.
    */
  def pagerank(edges: DataFrame, iters: Int, damping: Double = 0.85,
               mass: Double = 1000.0): DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
    val n = nodes.agg(count(lit(1)).cast("double").as("nn"))
    // Out-weight folded into the edge once: each iteration then only
    // joins ranks and regroups — no per-round outdegree recompute.
    val outw = edges.groupBy("src").agg(sum(col("w")).as("outw"))
    val shares = edges.join(outw, "src")
      .select(col("src"), col("dst"), (col("w") / col("outw")).as("share"))
    val base = nodes.crossJoin(broadcast(n))
    var pr = base.select(col("node"), round(lit(mass) / col("nn"), 6).as("pr"))
    for (_ <- 1 to iters) {
      val pushed = shares.join(pr, shares("src") === pr("node"))
        .groupBy(col("dst")).agg(sum(col("pr") * col("share")).as("c"))
      pr = base.join(pushed, base("node") === pushed("dst"), "left")
        .select(col("node"),
          round(lit((1.0 - damping) * mass) / col("nn")
            + lit(damping) * coalesce(col("c"), lit(0.0)), 6).as("pr"))
    }
    pr
  }
}
