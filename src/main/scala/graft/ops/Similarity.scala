package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k (broadcast the query side, stream
  * the candidates — one narrow pass over the big side, per-query top-k
  * via window). Scale path: bucketed search (coarse-quantizer blocking,
  * IVF-style) so only same-cell pairs are scored.
  *
  * All arithmetic is done in DOUBLE after an explicit cast from float —
  * this makes Spark's left-fold `aggregate` bit-identical to the DuckDB
  * oracle's `list_reduce` on the same values.
  */
object Similarity {

  /** Native sequential-fold dot product (graft.functions.DotProduct). */
  def dot(a: Column, b: Column): Column = graft.functions.GraftFunctions.dot_product(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Embeddings with the float vector cast to double once, up front. */
  def asDouble(embeddings: DataFrame, vecCol: String = "embedding"): DataFrame =
    embeddings.withColumn(vecCol, col(vecCol).cast("array<double>"))

  /** Pre-normalize vectors to unit length so pairwise cosine degrades to
    * a single dot product — O(n·d) normalization once instead of O(n²·d)
    * norm recomputation inside the pair loop. The ONLY sane layout for
    * similarity search at scale; the oracle mirrors the exact formula
    * (x / sqrt(dot(v,v)) per element, then plain dot per pair).
    */
  def normalized(embeddings: DataFrame, vecCol: String = "embedding"): DataFrame =
    embeddings.withColumn(vecCol,
      graft.functions.GraftFunctions.normalize_vector(col(vecCol)))

  /** Deterministic hyperplane for OR-amplified multi-table sign-LSH —
    * md5-derived like `Queries.LshPlanes` (the DuckDB oracle regenerates
    * the identical values from the same tag strings, so signs — and
    * therefore buckets — are bit-exact across engines).
    */
  def mtPlane(table: Int, plane: Int, dim: Int = 64): Seq[Double] =
    (0 until dim).map { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val d = md.digest(s"mt:$table:$plane:$i".getBytes("UTF-8"))
      val h = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
        ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
        ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
      (h % 1000L) / 1000.0 - 0.5
    }

  /** Multi-table sign-LSH codes: `(vec_id, t, code)` — one `bits`-bit
    * sign code per vector per table, `tables` independent tables.
    *
    * Single-code LSH AND-amplifies: P[collide] = p^bits with
    * p = 1 − θ/π per hyperplane, which on weakly-concentrated data
    * (near-uniform synthetic embeddings: top-3 cosine ≈ 0.34 → p ≈ 0.61,
    * p⁸ ≈ 2%) recalls almost nothing. Independent tables OR-amplify:
    * P[any collision] = 1 − (1−p^bits)^tables — measured recall@3 0.90+
    * at 32×6 on all three SFs where the single 8-bit code measured 0.00.
    * Cost model: candidate volume ≈ tables · Σ|bucket|²/n per table —
    * tune (tables, bits) to the corpus' similarity concentration; the
    * shuffles stay (t, code) equi-joins at any scale.
    *
    * The 192 plane dots are one codegen'd projection per row (native
    * sequential-fold [[dot]]); the array of per-table codes explodes to
    * 3-int rows WITHOUT the embedding, so the shuffled code table is
    * narrow.
    */
  def lshMultiTableCodes(e: DataFrame, tables: Int = 32, bits: Int = 6): DataFrame = {
    require(bits < 31, "bits must fit an int code")
    val codeStructs = (0 until tables).map { t =>
      val code = (0 until bits).map { p =>
        when(dot(col("embedding"), typedLit(mtPlane(t, p))) > 0,
          lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)
      struct(lit(t).as("t"), code.cast("long").as("code"))
    }
    e.select(col("vec_id"), explode(array(codeStructs: _*)).as("tc"))
      .select(col("vec_id"), col("tc.t").as("t"), col("tc.code").as("code"))
  }

  /** Multi-table ANN top-k of `queries` against `corpus` (both
    * `(vec_id, embedding)`, already [[normalized]]): queries are coded
    * with the same planes, bucket-matched per table against the corpus
    * code table, union-deduped, exact-cosine reranked. The QUERY side
    * is broadcast (by contract the small side — an eval set or one
    * micro-batch); pass `corpusCodes` to reuse a materialized corpus
    * code table (the static side of streaming ingest — computed once,
    * not per batch). Self-matches (same vec_id) are excluded.
    */
  def lshMultiTableTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      tables: Int = 32, bits: Int = 6,
      corpusCodes: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cCodes = corpusCodes.getOrElse(lshMultiTableCodes(corpus, tables, bits))
    val qCodes = lshMultiTableCodes(queries, tables, bits)
      .select(col("t"), col("code"), col("vec_id").as("query_id"))
    val cand = cCodes.join(broadcast(qCodes), Seq("t", "code"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .distinct()
    val qv = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val cv = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    cand.join(cv, "neighbor_id").join(broadcast(qv), "query_id")
      .withColumn("cos_sim", dot(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        round(col("cos_sim"), 6).as("cos_sim"))
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * candidates (excluding self). Inputs must be [[normalized]]; query
    * side is broadcast; candidates stream; ties broken by candidate id.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = candidates.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", dot(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk").cast("long").as("rnk"),
        round(col("cos_sim"), 6).as("cos_sim"))
  }

  /** IVF coarse quantizer, stage 1: per-cell elementwise centroid
    * (posexplode → partial-avg → re-assemble; values rounded 6dp so the
    * hash-agg accumulation order can't leak into cell assignments).
    * Seeded here from the label column; k-means iterations would loop
    * assign→recompute over the same two building blocks.
    */
  def centroids(e: DataFrame): DataFrame =
    e.select(col("label").cast("long").as("cell"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("cell"), col("dim"))
      .agg(round(avg(col("x")), 6).as("m"))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
        s => s.getField("m")).as("cv"))

  /** IVF stage 2: assign each vector to its nearest centroid by squared
    * L2 via the dot identity |v-c|² = v·v − 2v·c + c·c (native dots);
    * ties broken by cell id. Cost O(n·k), centroids broadcast.
    */
  def assignCells(e: DataFrame, cents: DataFrame): DataFrame = {
    val dist = dot(col("embedding"), col("embedding")) -
      lit(2.0) * dot(col("embedding"), col("cv")) + dot(col("cv"), col("cv"))
    // argmin via min(struct(dist, cell)): lexicographic struct ordering
    // gives the nearest cell with the id tie-break, as a hash aggregate
    // with map-side partial min — no per-vector sort window, no extra
    // shuffle round per k-means iteration.
    e.crossJoin(broadcast(cents))
      .withColumn("dist", dist)
      .groupBy(col("vec_id"))
      .agg(min(struct(col("dist"), col("cell"))).as("best"))
      .select(col("vec_id"), col("best.cell").as("cell"))
  }

  /** Lloyd's k-means over the embedding column: iterate assign
    * ([[assignCells]], O(n·k) with broadcast centroids) → recompute
    * (posexplode + partial-avg). Deterministic: seeded from the label
    * column, 6dp-rounded centroids, id tie-breaks. Each iteration is two
    * narrow-ish jobs; nothing driver-side except the loop itself — the
    * standard distributed k-means shape.
    */
  def kmeans(e: DataFrame, iterations: Int): (DataFrame, DataFrame) = {
    val spark = e.sparkSession
    import spark.implicits._
    // Materialize the k×d centroid table to the driver after every
    // recompute (exact doubles — values unchanged). Model state is tiny;
    // without this, iteration i's lazy lineage re-executes iterations
    // 1..i-1 from scratch (O(iterations²) passes over e). This is the
    // MLlib pattern: data stays distributed, the model rides the driver.
    def localize(df: DataFrame): DataFrame =
      spark.createDataset(
        df.select(col("cell").cast("long"), col("cv")).as[(Long, Seq[Double])].collect().toSeq
      ).toDF("cell", "cv")
    var cents = localize(centroids(e))
    for (_ <- 0 until iterations) {
      val assigned = assignCells(e, cents)
      // Distributed part stops at the (cell, dim) partial means — ONE
      // map-side-combined hash aggregate over the data. The k×d mean
      // rows are model-sized, so the array re-assembly (the second
      // groupBy + array_sort it used to cost per iteration) happens on
      // the driver during the collect that was needed anyway.
      val means = e.join(assigned, "vec_id")
        .select(col("cell").cast("long").as("cell"),
          posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim"))
        .agg(round(avg(col("x")), 6).as("m"))
        .as[(Long, Int, Double)].collect()
      val cvs = means.groupBy(_._1).toSeq.map { case (cell, rows) =>
        (cell, rows.sortBy(_._2).map(_._3).toSeq)
      }
      cents = spark.createDataset(cvs).toDF("cell", "cv")
    }
    (assignCells(e, cents), cents)
  }

  /** Dominant principal component of the embedding cloud (uncentered
    * PCA) by POWER ITERATION on the Gram matrix, with every step in
    * exact integer arithmetic so the result is engine-reproducible —
    * the whitening/compression precursor to ANN indexing (project onto
    * the top component(s) before coarse quantization).
    *
    * The float-determinism problem with distributed PCA is that
    * G = Σ x·xᵀ is a float sum whose partition order varies. Here the
    * vectors are quantized once (round(x·1e6) — the q_quantize
    * device), so the Gram entries are EXACT integer sums
    * (order-free, map-side combinable), and each power-iteration step
    * y = G·v normalizes by max|y| with one correctly-rounded double
    * division per element — identical on any IEEE-754 engine — then
    * re-quantizes to 1e6-scaled integers. No L2 norm is ever summed in
    * floating point.
    *
    * Scale shape: the Gram pass is ONE aggregation of n·d² narrow rows
    * to d² cells (map-side partials absorb n; d=64 → 4096 rows), the
    * iteration state is d-sized, and the projection is one explode +
    * broadcast join — the MLlib "data distributed, model tiny" shape.
    * The d²-row Gram table is localCheckpointed so iterations re-plan
    * from 4096 rows, not from the corpus.
    *
    * Output: (vec_id, pc1_e12) — the projection onto the dominant
    * eigenvector in 1e-12 units (quantized-vector · quantized-eigvec),
    * an exact integer.
    */
  def pcaPowerProjection(e: DataFrame, iterations: Int = 3): DataFrame = {
    val q = e.select(col("vec_id"), expr(
      "transform(embedding, x -> cast(round(cast(x as double) * 1000000.0, 0) as bigint))").as("q"))
    val pr = q.select(posexplode(col("q")).as(Seq("ii", "qi")), col("q"))
      .select(col("ii"), col("qi"), posexplode(col("q")).as(Seq("jj", "qj")))
    // decimal(38,0) accumulation: long·long products reach ~1e13 and the
    // corpus sum must stay exact at any n (long would wrap past ~1e6 rows)
    val g = pr.groupBy(col("ii"), col("jj"))
      .agg(sum(col("qi").cast("decimal(19,0)") * col("qj").cast("decimal(19,0)")).as("g"))
    val mg = g.agg(max(abs(col("g"))).as("mg"))
    // normalize the matrix once to 1e6-scaled integers: every later
    // matvec then fits comfortably in BIGINT (64 · 1e6 · 1e6 ≈ 6e13)
    val g6 = g.crossJoin(broadcast(mg))
      .select(col("ii"), col("jj"),
        round(col("g").cast("double") / col("mg").cast("double") * 1000000.0, 0)
          .cast("long").as("w"))
      .localCheckpoint(true)
    var v = g6.select(col("jj")).distinct().select(col("jj"), lit(1000000L).as("v"))
    for (_ <- 1 to iterations) {
      val y = g6.join(broadcast(v), "jj")
        .groupBy(col("ii")).agg(sum(col("w") * col("v")).as("y"))
      val m = y.agg(max(abs(col("y")).cast("double")).as("m"))
      v = y.crossJoin(broadcast(m))
        .select(col("ii").as("jj"),
          round(col("y").cast("double") / col("m") * 1000000.0, 0).cast("long").as("v"))
    }
    q.select(col("vec_id"), posexplode(col("q")).as(Seq("jj", "qv")))
      .join(broadcast(v), "jj")
      .groupBy(col("vec_id")).agg(sum(col("qv") * col("v")).as("pc1_e12"))
  }

  /** Total within-cluster squared distance (inertia) of an assignment. */
  def inertia(e: DataFrame, assigned: DataFrame, cents: DataFrame): Double =
    e.join(assigned, "vec_id").join(cents, "cell")
      .select(sum(
        dot(col("embedding"), col("embedding")) -
          lit(2.0) * dot(col("embedding"), col("cv")) +
          dot(col("cv"), col("cv"))).as("s"))
      .collect()(0).getDouble(0)

  /** SemDeDup-style semantic deduplication: cluster the embedding space
    * with k-means (the coarse quantizer — data-derived cells, unlike
    * [[blockedNearDup]]'s given blocks), then drop the larger id of any
    * same-cell pair whose cosine ≥ `tau`. Returns the DROPPED set
    * (vec_id, cell) — duplicate-sized, the anti-join input for the keep
    * side. Scale shape: Lloyd iterations are broadcast-model passes;
    * the pair scoring is Σ|cell|² (never all-pairs); the normalized +
    * assigned working set is persisted once so the self-join's two
    * branches don't re-run the assign pass.
    */
  def semanticDedup(e: DataFrame, iterations: Int, tau: Double): DataFrame = {
    val (assigned, _) = kmeans(e, iterations)
    val n = normalized(e).join(assigned, "vec_id")
      .select(col("cell"), col("vec_id"), col("embedding")).persist()
    val a = n.select(col("cell"), col("vec_id").as("vec_a"), col("embedding").as("va"))
    val b = n.select(col("cell"), col("vec_id").as("vec_b"), col("embedding").as("vb"))
    a.join(b, Seq("cell")).filter(col("vec_a") < col("vec_b"))
      .filter(dot(col("va"), col("vb")) >= tau)
      .select(col("cell"), col("vec_b").as("vec_id")).distinct()
  }

  /** Blocked (IVF-style) near-duplicate detection: score only pairs
    * sharing a coarse cell (here the `label` column stands in for a
    * quantizer cell assignment). Replaces O(n²) with Σ|cell|². Inputs
    * must be [[normalized]].
    */
  def blockedNearDup(embeddings: DataFrame, blockCol: String, threshold: Double): DataFrame = {
    val a = embeddings.select(col(blockCol).as("blk"),
      col("vec_id").as("vec_a"), col("embedding").as("va"))
    val b = embeddings.select(col(blockCol).as("blk"),
      col("vec_id").as("vec_b"), col("embedding").as("vb"))
    a.join(b, Seq("blk")).filter(col("vec_a") < col("vec_b"))
      .withColumn("cos_sim", dot(col("va"), col("vb")))
      .filter(col("cos_sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos_sim"), 6).as("cos_sim"))
  }

  // --------------------------------------------------------------------
  // Product quantization (Jégou et al., "Product Quantization for
  // Nearest Neighbor Search"): the memory side of ANN at corpus scale.
  // A d-dim float vector costs 4d bytes; its PQ code costs m small
  // integers — the 100 TB story is that the CODES (and a k·d codebook)
  // fit where the raw vectors never could, and ADC scans them with one
  // narrow broadcast-join pass, linear in n.
  // --------------------------------------------------------------------

  /** `(row..., s, sv)`: each vector split into `m` contiguous
    * subvectors of d/m dims (d must divide evenly; subspace `s` in
    * 0..m-1). One explode per row — the shared front of codebook
    * training, encoding, and query LUT construction.
    */
  def pqSubvectors(e: DataFrame, m: Int, vecCol: String = "embedding"): DataFrame = {
    val len = (size(col(vecCol)) / m).cast("int")
    e.select(col("*"), explode(sequence(lit(0), lit(m - 1))).as("s"))
      .withColumn("sv", slice(col(vecCol), col("s") * len + 1, len))
      .drop(vecCol)
  }

  /** PQ codebooks `(s, cell, cv)`: per subspace, seed-assigned means
    * (seed defaults to the label column, the [[centroids]] convention)
    * optionally refined by `lloydRounds` per-subspace Lloyd iterations
    * — each round one assign pass ([[pqEncode]]: broadcast books,
    * argmin via min(struct)) plus one recompute pass (posexplode →
    * partial-avg), exactly the [[kmeans]] discipline: 6dp-rounded
    * centroids each round so hash-agg accumulation order can't leak
    * into cell assignments, cell-id tie-breaks, and cells that lose
    * all members DROP from the book (deterministic on both engines).
    * m·k·(d/m) = k·d doubles total — model-sized at any corpus size,
    * so each round's book is localized to the driver (the MLlib
    * pattern: data stays distributed, the model rides the driver;
    * without it round i's lazy lineage re-runs rounds 1..i-1).
    */
  def pqCodebooks(e: DataFrame, m: Int): DataFrame = pqCodebooks(e, m, 0)

  def pqCodebooks(e: DataFrame, m: Int, lloydRounds: Int): DataFrame =
    pqCodebooks(e, m, lloydRounds, col("label").cast("long"))

  def pqCodebooks(e: DataFrame, m: Int, lloydRounds: Int, seed: Column): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val base = e.select(col("vec_id"), seed.as("pq_seed"), col("embedding"))
    def booksFrom(tagged: DataFrame): DataFrame =
      tagged
        .select(col("s"), col("cell"), posexplode(col("sv")).as(Seq("dim", "x")))
        .groupBy(col("s"), col("cell"), col("dim"))
        .agg(round(avg(col("x")), 6).as("mu"))
        .groupBy(col("s"), col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("mu")))),
          t => t.getField("mu")).as("cv"))
    def localize(df: DataFrame): DataFrame =
      spark.createDataset(
        df.select(col("s").cast("int"), col("cell").cast("long"), col("cv"))
          .as[(Int, Long, Seq[Double])].collect().toSeq
      ).toDF("s", "cell", "cv")
    var books = booksFrom(
      pqSubvectors(base, m).select(col("s"), col("pq_seed").as("cell"), col("sv")))
    if (lloydRounds > 0) {
      books = localize(books)
      for (_ <- 0 until lloydRounds) {
        val assigned = pqEncode(e, books, m)
        books = localize(booksFrom(
          pqSubvectors(base, m).join(assigned, Seq("vec_id", "s"))
            .select(col("s"), col("cell"), col("sv"))))
      }
    }
    books
  }

  /** PQ encoding `(vec_id, s, cell)`: per subspace, the nearest
    * codebook centroid by squared L2 (dot identity, broadcast
    * codebooks, argmin via min(struct) — one narrow pass, m rows per
    * vector, no raw vectors in the output).
    */
  def pqEncode(e: DataFrame, books: DataFrame, m: Int): DataFrame = {
    val dist = dot(col("sv"), col("sv")) -
      lit(2.0) * dot(col("sv"), col("cv")) + dot(col("cv"), col("cv"))
    pqSubvectors(e.select(col("vec_id"), col("embedding")), m)
      .join(broadcast(books), "s")
      .withColumn("dist", dist)
      .groupBy(col("vec_id"), col("s"))
      .agg(min(struct(col("dist"), col("cell"))).as("best"))
      .select(col("vec_id"), col("s"), col("best.cell").as("cell"))
  }

  /** Asymmetric-distance (ADC) top-k: each query's per-(subspace, cell)
    * squared-L2 table is precomputed EXACTLY ONCE (|queries|·m·k rows —
    * broadcast-sized), 1e6-floor-quantized to integers so the m-way
    * per-pair sum is exact and order-free; the corpus is then scanned
    * through its CODES only — one broadcast equi-join on (s, cell) +
    * one hash aggregate, linear in n, never touching raw corpus
    * vectors. Ties break by neighbor id; self-matches excluded.
    * Output `(query_id, neighbor_id, rnk, adc_e6)` (ascending ADC —
    * it approximates squared L2 DISTANCE, not similarity).
    */
  def pqAdcTopK(queries: DataFrame, corpusCodes: DataFrame, books: DataFrame,
      k: Int, m: Int): DataFrame = {
    val qsub = pqSubvectors(
      queries.select(col("vec_id").as("query_id"), col("embedding")), m,
      vecCol = "embedding")
    val lut = qsub.join(books, "s")
      .select(col("query_id"), col("s"), col("cell"),
        floor((dot(col("sv"), col("sv")) -
          lit(2.0) * dot(col("sv"), col("cv")) + dot(col("cv"), col("cv")))
          * lit(1000000.0)).cast("long").as("d_e6"))
    val scored = corpusCodes.join(broadcast(lut), Seq("s", "cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum(col("d_e6")).as("adc_e6"))
    bottomKByQuery(scored, k)
  }

  // --------------------------------------------------------------------
  // IVF + PQ composition (the IVFADC shape of Jégou et al. §V): a coarse
  // quantizer prunes the scan to the query's nprobe nearest cells, and
  // within those cells ADC runs over PQ codes of the RESIDUAL
  // (vector − its coarse centroid) — residuals concentrate around 0, so
  // the same code budget quantizes them tighter than raw vectors. At
  // 100 TB this is the production vector-store layout: the corpus is
  // codes + a cell id, the scan reads only probed cells (partition
  // pruning when the code table is written partitioned by ivf_cell),
  // and both models (coarse centroids k·d, codebooks m·ksub·(d/m))
  // broadcast.
  // --------------------------------------------------------------------

  /** IVF residuals `(vec_id, ivf_cell, embedding)`: each vector minus
    * its assigned coarse centroid (elementwise zip_with; assignment via
    * [[assignCells]], centroids 6dp so both engines subtract identical
    * doubles). The PQ training/encode input of IVFADC.
    */
  def ivfResiduals(e: DataFrame, cents: DataFrame): DataFrame = {
    val asg = assignCells(e, cents)
      .select(col("vec_id"), col("cell").as("ivf_cell"))
    e.select(col("vec_id"), col("embedding"))
      .join(asg, "vec_id")
      .join(broadcast(cents.select(col("cell").as("ivf_cell"), col("cv"))), Seq("ivf_cell"))
      .select(col("vec_id"), col("ivf_cell"),
        zip_with(col("embedding"), col("cv"), (a, b) => a - b).as("embedding"))
  }

  /** Per-query probed cells `(query_id, ivf_cell, qres)`: the nprobe
    * nearest coarse cells by squared L2 (cell-id tie-break), each with
    * the query's residual against that cell's centroid. The rank window
    * is per-query over the CENTROID table only — bounded by the model
    * size, never the corpus.
    */
  def ivfProbedCells(queries: DataFrame, cents: DataFrame, nprobe: Int): DataFrame =
    ivfProbedCellsRanked(queries, cents)
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("ivf_cell"), col("qres"))

  /** All cells ranked per query `(query_id, ivf_cell, rn, qres)` — the
    * unfiltered front of [[ivfProbedCells]], kept whole for the
    * recall-vs-nprobe sweep.
    */
  def ivfProbedCellsRanked(queries: DataFrame, cents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dist = dot(col("qv"), col("qv")) -
      lit(2.0) * dot(col("qv"), col("cv")) + dot(col("cv"), col("cv"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("cell"))
    queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("dist", dist)
      .withColumn("rn", row_number().over(w))
      .select(col("query_id"), col("cell").as("ivf_cell"), col("rn"),
        zip_with(col("qv"), col("cv"), (a, b) => a - b).as("qres"))
  }

  /** IVFADC top-k: ADC over residual PQ codes, restricted to each
    * query's probed cells. The LUT is per (query, probed cell,
    * subspace, codeword) — |Q|·nprobe·m·ksub rows, broadcast-sized —
    * and the scan is one equi-join of the code table against it on
    * `(ivf_cell, s, cell)`: a vector participates only when its cell is
    * probed for that query, so the join IS the pruning. Distances
    * 1e6-floor-quantized like [[pqAdcTopK]]; selection via the bounded
    * partial [[bottomKByQuery]]. `corpusCodes` must carry
    * `(vec_id, ivf_cell, s, cell)` (codes of [[ivfResiduals]] joined
    * back to their cell assignment).
    */
  def ivfPqTopK(queries: DataFrame, corpusCodes: DataFrame, cents: DataFrame,
      books: DataFrame, k: Int, m: Int, nprobe: Int): DataFrame = {
    val lut = pqSubvectors(
        ivfProbedCells(queries, cents, nprobe), m, vecCol = "qres")
      .join(books, "s")
      .select(col("query_id"), col("ivf_cell"), col("s"), col("cell"),
        floor((dot(col("sv"), col("sv")) -
          lit(2.0) * dot(col("sv"), col("cv")) + dot(col("cv"), col("cv")))
          * lit(1000000.0)).cast("long").as("d_e6"))
    val scored = corpusCodes.join(broadcast(lut), Seq("ivf_cell", "s", "cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum(col("d_e6")).as("adc_e6"))
    bottomKByQuery(scored, k)
  }

  /** EVAL variant for the recall-vs-nprobe sweep: ADC against a LUT
    * over ALL cells, each (query, neighbor) scored once and tagged
    * with `cell_rn` — the rank of the NEIGHBOR's cell among the
    * query's cells — so one pass yields every nprobe's candidate set
    * by filtering `cell_rn <= np` (the ADC sum itself is
    * nprobe-independent: a neighbor only ever joins its own cell's
    * LUT rows). Deliberately unpruned — this measures the knob, the
    * serving path stays [[ivfPqTopK]].
    */
  def ivfPqScoredAll(queries: DataFrame, corpusCodes: DataFrame, cents: DataFrame,
      books: DataFrame, m: Int): DataFrame = {
    val lut = pqSubvectors(
        ivfProbedCellsRanked(queries, cents), m, vecCol = "qres")
      .join(books, "s")
      .select(col("query_id"), col("ivf_cell"), col("rn"), col("s"), col("cell"),
        floor((dot(col("sv"), col("sv")) -
          lit(2.0) * dot(col("sv"), col("cv")) + dot(col("cv"), col("cv")))
          * lit(1000000.0)).cast("long").as("d_e6"))
    corpusCodes.join(broadcast(lut), Seq("ivf_cell", "s", "cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum(col("d_e6")).as("adc_e6"), max(col("rn")).as("cell_rn"))
  }

  /** Final per-query k-selection over `(query_id, neighbor_id, adc_e6)`
    * via the bounded partial-aggregatable
    * [[graft.ops.Aggregators.BottomKLong]] — each query ships at most k
    * candidates per partition to the final merge, never sorting its
    * corpus-length candidate list on one task (the TextOps.scala:233
    * house rule, per group). Shared by [[pqAdcTopK]] and [[ivfPqTopK]].
    */
  private[graft] def bottomKByQuery(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    scored.select(col("query_id"), col("neighbor_id"), col("adc_e6"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new Aggregators.BottomKLong(k).toColumn.name("topk"))
      .flatMap { case (qid, lst) =>
        lst.zipWithIndex.map { case ((adc, nid), i) =>
          (qid, nid, (i + 1).toLong, adc)
        }
      }
      .toDF("query_id", "neighbor_id", "rnk", "adc_e6")
  }
}
