package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Baseline: exact brute-force cosine top-k (broadcast the query set,
  * scan the corpus once — the right plan when queries are few and the
  * corpus is huge). Scale path: hyperplane-LSH bucketing so candidate
  * generation shuffles only bucket keys, probing a constant number of
  * buckets per query.
  *
  * All arithmetic is native `zip_with`/`aggregate` expressions —
  * codegen'd, no UDF in the scan.
  */
object Similarity {

  /** Dot product of two float-array columns. Each element is widened to
    * double BEFORE multiplying so the arithmetic is IEEE-double
    * end-to-end (float-precision accumulation would be engine-dependent
    * noise at the scale of near-tie rankings). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm (double arithmetic). */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity (0 where either side has zero norm) — native
    * Catalyst expression (graft.functions.CosineSim): the dot product
    * runs as a compiled float loop inside whole-stage codegen instead
    * of an interpreted per-element aggregate/zip_with fold. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosine(a, b)

  /** Sign-bit signature over `planes` fixed hyperplanes → one long
    * bucket key (native expression; hyperplane components are
    * hash-derived — deterministic across executors and runs). Vectors
    * with small angle collide with high probability. `seed` shifts the
    * hyperplane family (one family per LSH table). */
  def hyperplaneSignature(vec: Column, planes: Int, seed: Int = 0): Column =
    graft.functions.VectorFunctions.hyperplaneSignature(vec, planes, seed)

  /** (table, bucket) pairs over `tables` independent hyperplane
    * families — exploded rows for multi-table LSH. Per-table collision
    * probability p = (1 - θ/π)^planes; tables OR together to
    * 1-(1-p)^tables recall. */
  private def lshBuckets(vec: Column, planes: Int, tables: Int): Column =
    array((0 until tables).map(t =>
      struct(lit(t).as("tbl"), hyperplaneSignature(vec, planes, t).as("sig"))): _*)

  /** Corpus-sized plane count: `planes > 0` is used as-is; otherwise
    * planes = max(4, ⌈log₂(n/128)⌉), which pins expected bucket
    * occupancy near 128 at ANY corpus size — with FIXED planes, bucket
    * population (and candidate-pair count) grows linearly with the
    * corpus, so pairing grows super-linearly (measured 11.9× at 10×
    * data on `embeddingNearDupPairs` before this dial was shared; see
    * SCALE.md "Scaling study"). When `corpusCount < 0` this is an
    * EAGER count() at plan-construction — callers holding the size
    * pass it to stay lazy. */
  private[ops] def sizePlanes(planes: Int, corpusCount: Long, corpus: DataFrame,
                              occupancy: Int = 128): Int =
    if (planes > 0) planes
    else math.max(4, math.ceil(
      math.log(math.max(1.0,
        (if (corpusCount >= 0L) corpusCount else corpus.count()) / occupancy.toDouble))
        / math.log(2.0)).toInt)

  /** Random-projection dimensionality reduction (Johnson–Lindenstrauss
    * shape): project each embedding onto `k` fixed pseudo-random
    * hyperplanes. The projection matrix is FORMULA-DERIVED — entry
    * (i, j) = ((i·37 + j·101) mod 211 − 105) / 105 over 1-based
    * indices, small integers only — so it needs no broadcast, no
    * stored artifact, is identical on every executor, and any SQL
    * engine regenerates it exactly (the q_embed_project oracle does).
    * All arithmetic is IEEE double in ascending-index fold order, so
    * outputs are bit-identical across engines that fold left-to-right.
    * Map-side only — nothing shuffles at any corpus size. The output
    * column is the ANN-support reduction: k ≪ d cuts downstream
    * pair-scoring cost while approximately preserving angles. */
  def randomProjection(vec: Column, k: Int): Column = {
    require(k >= 1, "randomProjection: k >= 1")
    val j = (0 until k).map(_ + 1)
    array(j.map { jj =>
      aggregate(
        zip_with(vec, sequence(lit(1), size(vec)), (x, i) =>
          x.cast("double") *
            (((i * 37 + lit(jj) * 101) % 211 - 105).cast("double") / 105.0)),
        lit(0.0), (acc, v) => acc + v)
    }: _*)
  }

  /** Exact brute-force cosine top-k: every query against the full
    * corpus. Queries are broadcast (small side), the corpus scan is a
    * single pass, ranking is a per-query window top-k. */
  def bruteForceTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
                     queries: DataFrame, queryId: String, queryVec: String,
                     k: Int): DataFrame = {
    val c = corpus.select(col(corpusId).as("item_id"), col(corpusVec).as("item_vec"))
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("query_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("item_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("item_vec"), col("query_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("item_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("item_id"), col("cosine"), col("rank"))
  }

  /** Contrastive-pair mining: for each query, the most similar item
    * of the SAME label (the positive) and the most similar item of a
    * DIFFERENT label (the hard negative) — the pair-construction step
    * of contrastive/metric training. Brute force over the given
    * corpus (queries broadcast, corpus streamed — same shape as
    * [[bruteForceTopK]]; pre-filter the corpus or use the LSH/IVF path
    * to mine from candidates at full scale). Ties break on item id,
    * so results are engine-exact. */
  def hardNegatives(corpus: DataFrame, corpusId: String, corpusVec: String,
                    labelCol: String,
                    queries: DataFrame, queryId: String, queryVec: String): DataFrame = {
    val c = corpus.select(col(corpusId).as("item_id"), col(corpusVec).as("item_vec"),
      col(labelCol).as("item_label"))
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("query_vec"),
      col(labelCol).as("query_label"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("item_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("item_vec"), col("query_vec")))
      .withColumn("same", col("item_label") === col("query_label"))
    val w = Window.partitionBy(col("query_id"), col("same"))
      .orderBy(col("cosine").desc, col("item_id").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy(col("query_id"))
      .agg(
        max(when(col("same"), col("item_id"))).as("pos_id"),
        max(when(col("same"), col("cosine"))).as("pos_cos"),
        max(when(!col("same"), col("item_id"))).as("neg_id"),
        max(when(!col("same"), col("cosine"))).as("neg_cos"))
  }

  /** Approximate top-k via multi-table hyperplane LSH: `tables`
    * independent signature families, candidates = same (table, bucket)
    * on any table, deduped, then exact cosine rank. More tables →
    * higher recall, more planes → smaller buckets: the standard LSH
    * dial pair. The only shuffle carries (bucket, id, sig); each query
    * probes `tables` buckets instead of the whole corpus.
    *
    * Pass `planes <= 0` to size the bucket count from the corpus
    * (planes = log₂(n/128), min 4): expected bucket occupancy stays
    * ~constant as the corpus grows, so per-query candidate work is
    * O(tables · 128) at ANY corpus size — with FIXED planes, buckets
    * grow linearly with the corpus and an all-corpus query sweep costs
    * quadratic candidate pairs (measured 42× time at 10× data before
    * auto-sizing; SCALE.md "Scaling study").
    *
    * Recall under auto-sizing depends on how close neighbors are:
    * per-table collision is (1-θ/π)^planes, so growing planes with the
    * corpus suits high-similarity targets (θ small — near-dup search:
    * cos 0.9 → ~0.86/plane, 7 planes ≈ 0.34/table, 8 tables ≈ 0.96)
    * but penalizes far neighbors (uniform-random fixtures sit at
    * cos≈0.4). For far-neighbor workloads fix `planes` explicitly and
    * pay bucket growth, or raise `tables`. */
  def lshTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              k: Int, planes: Int = 8, tables: Int = 8,
              corpusCount: Long = -1L): DataFrame = {
    // planes <= 0 needs the corpus size, which is an EAGER count() at
    // plan-construction — surprising in an otherwise lazy API, and it
    // re-executes the corpus's full upstream lineage when that is an
    // expensive derived frame. Callers holding the size (or willing to
    // count a cached frame once) pass `corpusCount` to keep the call
    // lazy; otherwise cache the corpus before auto-sizing.
    val nPlanes = sizePlanes(planes, corpusCount, corpus)
    // Candidate generation carries IDS ONLY: the exploded signature
    // rows are (id, tbl, sig) — ~24 bytes — not the embedding payload,
    // so the bucket join and the pair-dedup never shuffle vectors (the
    // naive shape replicates each vector `tables`× through the join).
    // Vectors attach once per distinct candidate pair afterwards.
    val cSig = corpus.select(col(corpusId).as("item_id"),
        explode(lshBuckets(col(corpusVec), nPlanes, tables)).as("b"))
      .select(col("item_id"), col("b.tbl").as("tbl"), col("b.sig").as("sig"))
    val qSig = queries.select(col(queryId).as("query_id"),
        explode(lshBuckets(col(queryVec), nPlanes, tables)).as("b"))
      .select(col("query_id"), col("b.tbl").as("tbl"), col("b.sig").as("sig"))
    val pairs = cSig.join(qSig, Seq("tbl", "sig"))
      .filter(col("item_id") =!= col("query_id"))
      .select(col("query_id"), col("item_id"))
      .distinct()
    val cand = pairs
      .join(corpus.select(col(corpusId).as("item_id"), col(corpusVec).as("item_vec")),
        Seq("item_id"))
      .join(broadcast(queries.select(col(queryId).as("query_id"),
        col(queryVec).as("query_vec"))), Seq("query_id"))
    val scored = cand.withColumn("cosine", cosine(col("item_vec"), col("query_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("item_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("item_id"), col("cosine"), col("rank"))
  }

  /** Distributed k-means (Lloyd) — builds the IVF coarse codebook.
    *
    * Every iteration is DataFrame-side: assign each vector to its
    * nearest current centroid (a map-only projection via the
    * reference-object codebook expression — no shuffle), then recompute centroids as
    * per-cell per-dimension means (posexplode + groupBy(cell, pos) —
    * one k×d-row aggregate). Only k×d doubles ever reach the driver,
    * per iteration; no row sample is collected.
    *
    * The training set is a UNIFORM hash-based sample of the corpus
    * (~`targetSample` rows, deterministic in `id`) — codebook quality
    * no longer depends on id-prefix locality, and training cost is
    * O(sample·k·d) regardless of corpus size. The default (4 000) gives
    * ≥250 training vectors per centroid at k=16; raise it with k
    * (≈250·k). Pass `targetSample = Int.MaxValue` to train on the
    * full corpus. Seeding: the k hash-smallest sample vectors
    * (deterministic, spread uniformly by the hash). */
  def kmeansCentroids(vectors: DataFrame, id: String, vec: String,
                      k: Int, iters: Int = 5, targetSample: Int = 4000): Array[Array[Double]] = {
    val n = vectors.count() // parquet footer counts — metadata-cheap
    require(n >= k, s"need >= $k vectors, got $n")
    // deterministic uniform sample: keep ids whose hash lands in the
    // smallest bucket range (no driver round-trip, no RNG state)
    val buckets = math.max(1L, n / math.max(1, targetSample))
    val sampled =
      (if (buckets <= 1L) vectors.select(col(id).as("__kid"), col(vec).as("__kv"))
       else vectors.select(col(id).as("__kid"), col(vec).as("__kv"))
         .filter(pmod(xxhash64(col("__kid")), lit(buckets)) === 0))
        .persist()
    try {
      val seeds = sampled.orderBy(xxhash64(col("__kid")), col("__kid")).limit(k)
        .select(col("__kv")).collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      require(seeds.length >= k, s"sample too small for $k centroids (${seeds.length})")
      var cents: Array[Array[Double]] = seeds
      val d = seeds.head.length
      for (_ <- 0 until iters) {
        // assign (map-only) then mean per (cell, dim): k*d rows collect.
        // The generator's when-guard depends on `cell` so ColumnPruning
        // cannot collapse the assignment above the Generate (which
        // would re-run the k×d cell scan once per exploded ELEMENT —
        // the same trap pqTrain documents)
        val means = sampled
          .select(nearestCell(col("__kv"), cents).as("cell"), col("__kv"))
          .select(col("cell"),
            posexplode(when(col("cell") >= 0, col("__kv"))).as(Seq("pos", "x")))
          .groupBy(col("cell"), col("pos")).agg(avg(col("x")).as("m"))
          .collect()
        val next = cents.map(_.clone()) // empty cell keeps its centroid
        // pos >= d: a sampled vector longer than the seed dimension
        // (mixed-dimension corpus) — ignore the overflow positions, the
        // same truncate-to-common-prefix rule the dot-product kernel uses
        means.foreach { r =>
          val pos = r.getInt(1)
          if (pos < d) next(r.getInt(0))(pos) = r.getDouble(2)
        }
        cents = next
      }
      cents
    } finally { sampled.unpersist(); () }
  }

  /** Nearest-cell rank against the codebook — one native expression
    * (graft.functions.NearestCellsExpr): the codebook travels as a
    * codegen reference object, so the generated code is codebook-
    * independent and cached across k-means iterations and IVF plans
    * (a literal-array codebook recompiled k·d literal nodes per plan —
    * the dominant cost of the previous shape). */
  private def nearestCell(vec: Column, centroids: Array[Array[Double]]): Column =
    element_at(graft.functions.VectorFunctions.nearestCells(vec, centroids, 1), 1)

  /** IVF coarse quantization: assign every vector to its nearest
    * centroid cell. Map-side only (no shuffle) — the partition-by-cell
    * layout is what makes 100 TB ANN tractable: each query later
    * touches nprobe/|cells| of the corpus. */
  def ivfAssign(vectors: DataFrame, id: String, vec: String,
                centroids: Array[Array[Double]]): DataFrame =
    vectors.select(col(id), col(vec), nearestCell(col(vec), centroids).as("cell"))

  /** Persist the corpus as an on-disk IVF index: one parquet partition
    * directory per coarse cell. Build cost is one assignment pass +
    * write; every later query batch reads ONLY its probed cells via
    * partition pruning (`ivfTopKIndexed`) instead of re-assigning the
    * corpus — the 100 TB serving shape. */
  def buildIvfIndex(corpus: DataFrame, corpusId: String, corpusVec: String,
                    path: String, centroids: Array[Array[Double]]): Unit =
    ivfAssign(corpus, corpusId, corpusVec, centroids)
      .write.partitionBy("cell").mode("overwrite").parquet(path)

  /** Append NEW vectors to a persisted IVF index: one assignment pass
    * over the arriving batch only, appended into the existing cell
    * directories — the "embeddings land daily" maintenance shape (the
    * ANN sibling of IncrementalDedup). The codebook is fixed at build
    * time: cell geometry must match the resident postings, so appends
    * reuse the build centroids; re-train and rebuild when distribution
    * drift degrades recall (monitor via the recall self-checks). */
  def ivfAppend(vectors: DataFrame, id: String, vec: String, path: String,
                centroids: Array[Array[Double]]): Unit =
    ivfAssign(vectors, id, vec, centroids)
      .write.partitionBy("cell").mode("append").parquet(path)

  /** Approximate top-k over a persisted IVF index. The distinct probe
    * cells of the query batch (≤ |codebook| values — bounded, driver-
    * side) become a static `cell IN (…)` predicate, so the scan's
    * PartitionFilters prune to probed cell directories: per-batch cost
    * is ~nprobe/|cells| of the corpus REGARDLESS of corpus size, with
    * no assignment pass. Same ranking as `ivfTopK` by construction. */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                     corpusId: String, corpusVec: String,
                     queries: DataFrame, queryId: String, queryVec: String,
                     k: Int, centroids: Array[Array[Double]], nprobe: Int = 4): DataFrame = {
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("query_vec"),
      explode(graft.functions.VectorFunctions.nearestCells(
        col(queryVec), centroids, nprobe)).as("cell"))
    val probed = q.select("cell").distinct().collect().map(_.getInt(0)).sorted
    val corpus = spark.read.parquet(indexPath)
      .filter(col("cell").isin(probed.map(_.asInstanceOf[Any]): _*))
      .select(col("cell"), col(corpusId).as("item_id"), col(corpusVec).as("item_vec"))
    val cand = corpus.join(broadcast(q), Seq("cell"))
      .filter(col("item_id") =!= col("query_id"))
      .select(col("query_id"), col("query_vec"), col("item_id"), col("item_vec"))
    val scored = cand.withColumn("cosine", cosine(col("item_vec"), col("query_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("item_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("item_id"), col("cosine"), col("rank"))
  }

  /** IVF approximate top-k: corpus partitioned by nearest cell, each
    * query probes its `nprobe` nearest cells, exact cosine rank within
    * the probed cells. Recall is tunable via nprobe/|cells|; cost per
    * query is ~nprobe/|cells| of a full scan. At scale, size the
    * codebook ~sqrt(corpus) so cells stay executor-sized, and persist
    * the cell assignment via `buildIvfIndex` so repeated query batches
    * skip re-assignment (`ivfTopKIndexed`). */
  def ivfTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              k: Int, centroids: Array[Array[Double]], nprobe: Int = 4): DataFrame = {
    val c = ivfAssign(corpus, corpusId, corpusVec, centroids)
      .select(col(corpusId).as("item_id"), col(corpusVec).as("item_vec"), col("cell"))
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("query_vec"),
        explode(graft.functions.VectorFunctions.nearestCells(
          col(queryVec), centroids, nprobe)).as("cell"))
    val cand = c.join(broadcast(q), Seq("cell"))
      .filter(col("item_id") =!= col("query_id"))
      .select(col("query_id"), col("query_vec"), col("item_id"), col("item_vec"))
    val scored = cand.withColumn("cosine", cosine(col("item_vec"), col("query_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("item_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("item_id"), col("cosine"), col("rank"))
  }

  // ---------------------------------------------------------------- PQ

  /** L2-normalized copy of a float-vector column, still array<float>
    * (zero vectors pass through). The norm lambda-binds through a
    * one-element transform so it computes ONCE per row — an expression
    * referenced from a per-element lambda body re-evaluates per
    * element (the tokenize-once lesson). */
  private def l2normalizedF(vec: Column): Column =
    element_at(transform(array(norm(vec)), nv =>
      transform(vec, x =>
        when(nv === 0.0, x)
          .otherwise((x.cast("double") / nv).cast("float")))), 1)

  /** Product-quantization codebooks: one per-subspace k-means codebook
    * over the L2-NORMALIZED corpus (m subspaces of dim/m dims each,
    * `ksub` centroids per subspace — classic PQ(m×ksub)). Memory is
    * the 100 TB point: a 64-dim float vector (256 B) compresses to m
    * one-byte codes (8 B at m=8) — the whole corpus's codes fit where
    * 3% of its raw vectors would, so the ADC scan touches 30× less
    * data than a brute-force scan. Training cost is m independent
    * sampled k-means, O(sample·ksub·dim) total, driver traffic
    * m·ksub·subDim doubles. */
  def pqTrain(vectors: DataFrame, id: String, vec: String,
              m: Int = 8, ksub: Int = 16, iters: Int = 5,
              dim: Int = -1, targetSample: Int = 4000): Array[Array[Array[Double]]] = {
    val d = if (dim > 0) dim
            else vectors.select(size(col(vec)).as("d")).head().getInt(0)
    require(m >= 1 && d % m == 0, s"dim $d must divide into m=$m subspaces")
    val subDim = d / m
    // all m subspaces train JOINTLY, one pass per Lloyd iteration: the
    // per-subspace spelling (m separate kmeansCentroids calls) costs
    // m·iters·2 scheduler round-trips — 13.5 s of the 10× gate was
    // job overhead, not math. Sampling rule matches kmeansCentroids.
    val n = vectors.count()
    require(n >= ksub, s"need >= $ksub vectors, got $n")
    val buckets = math.max(1L, n / math.max(1, targetSample))
    val base = vectors.select(col(id).as("__pid"), l2normalizedF(col(vec)).as("__pv"))
    val sampled =
      (if (buckets <= 1L) base
       else base.filter(pmod(xxhash64(col("__pid")), lit(buckets)) === 0))
        .persist()
    try {
      val seedRows = sampled.orderBy(xxhash64(col("__pid")), col("__pid")).limit(ksub)
        .select(col("__pv")).collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      require(seedRows.length >= ksub,
        s"sample too small for $ksub sub-centroids (${seedRows.length})")
      // seed subspace j's codebook from the same ksub sample vectors
      var cents: Array[Array[Array[Double]]] = Array.tabulate(m, ksub) { (j, c) =>
        java.util.Arrays.copyOfRange(seedRows(c),
          j * subDim, math.min((j + 1) * subDim, seedRows(c).length))
      }
      for (_ <- 0 until iters) {
        // one job: per-row cell assignment for ALL subspaces, then the
        // exploded positions tag themselves with (subspace, cell, dim)
        val cellsCol = array((0 until m).map(j =>
          element_at(graft.functions.VectorFunctions.nearestCells(
            slice(col("__pv"), j * subDim + 1, subDim), cents(j), 1), 1)): _*)
        // the generator must DEPEND on `cells` (the no-op when guard):
        // otherwise ColumnPruning collapses the assignment expression
        // above the Generate and all m nearestCells re-evaluate once
        // per exploded ELEMENT — measured 8 s/iteration vs 0.5 s
        val means = sampled
          .select(cellsCol.as("cells"), col("__pv"))
          .select(col("cells"),
            posexplode(when(size(col("cells")) >= 0, col("__pv")))
              .as(Seq("pos", "x")))
          .select((col("pos") / subDim).cast("int").as("j"),
            element_at(col("cells"), (col("pos") / subDim).cast("int") + 1).as("cell"),
            pmod(col("pos"), lit(subDim)).as("sp"), col("x"))
          .groupBy(col("j"), col("cell"), col("sp")).agg(avg(col("x")).as("mn"))
          .collect()
        val next = cents.map(_.map(_.clone())) // empty cell keeps its centroid
        means.foreach { r =>
          val j = r.getInt(0)
          val sp = r.getInt(2)
          if (j < m && sp < cents(j)(r.getInt(1)).length)
            next(j)(r.getInt(1))(sp) = r.getDouble(3)
        }
        cents = next
      }
      cents
    } finally { sampled.unpersist(); () }
  }

  /** Encode every vector as its m sub-centroid codes (array<int>,
    * values < ksub). Map-only projection — the codebooks ride as
    * expression reference objects; the normalized vector lambda-binds
    * once and each subspace reads its slice. At scale this is the
    * frame you PERSIST: 100 TB of vectors become ~3 TB of codes. */
  def pqEncode(vectors: DataFrame, id: String, vec: String,
               codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.length
    val subDim = codebooks.head.head.length
    val codes = element_at(transform(array(l2normalizedF(col(vec))), v =>
      array((0 until m).map(j =>
        element_at(graft.functions.VectorFunctions.nearestCells(
          slice(v, j * subDim + 1, subDim), codebooks(j), 1), 1)): _*)), 1)
    vectors.select(col(id).as("item_id"), codes.as("codes"))
  }

  /** PQ approximate top-k with asymmetric distance computation (ADC)
    * and exact re-rank.
    *
    * Per query the driver precomputes the m×ksub lookup table
    * lut[j][c] = <q̂_j, centroid_{j,c}> (a few KB — queries are a
    * bounded batch, the same contract as the other top-k entry
    * points), so scoring a corpus vector is m ARRAY LOOKUPS over its
    * codes — no float math against raw vectors. The ADC scan keeps
    * only `pool`·k candidates per query (window top-k), and ONLY
    * those rows fetch their raw vectors for the exact cosine re-rank:
    * at scale the full-vector column is read for pool·k·|queries|
    * rows total, not the corpus. */
  def pqTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
             queries: DataFrame, queryId: String, queryVec: String,
             k: Int, codebooks: Array[Array[Array[Double]]],
             pool: Int = 8): DataFrame = {
    val spark = corpus.sparkSession
    val m = codebooks.length
    val ksub = codebooks.head.length
    val subDim = codebooks.head.head.length
    val codes = pqEncode(corpus, corpusId, corpusVec, codebooks)
    // driver-side LUTs: one flat m·ksub array per query
    val qRows = queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"))
      .collect()
    val lutRows = qRows.map { r =>
      val qv = r.getSeq[Float](1).map(_.toDouble).toArray
      val nrm = math.sqrt(qv.map(x => x * x).sum)
      val qn = if (nrm > 0) qv.map(_ / nrm) else qv
      val lut = new Array[Double](m * ksub)
      var j = 0
      while (j < m) {
        var c = 0
        while (c < ksub) {
          val cent = codebooks(j)(c)
          var acc = 0.0
          var i = 0
          while (i < subDim && j * subDim + i < qn.length) {
            acc += qn(j * subDim + i) * cent(i); i += 1
          }
          lut(j * ksub + c) = acc
          c += 1
        }
        j += 1
      }
      org.apache.spark.sql.Row(r.get(0), lut.toSeq)
    }
    val idType = queries.select(col(queryId)).schema.head.dataType
    val lutDf = spark.createDataFrame(
      java.util.Arrays.asList(lutRows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query_id", idType),
        org.apache.spark.sql.types.StructField("lut",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
    val adc = codes.crossJoin(broadcast(lutDf))
      .filter(col("item_id") =!= col("query_id"))
      // native codegen'd kernel — the interpreted `aggregate` HOF costs
      // a lambda dispatch per (row, subspace) on the corpus×query scan
      .withColumn("adc", graft.functions.VectorFunctions.adcScore(
        col("codes"), col("lut"), ksub))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("item_id").asc)
    val cand = adc.withColumn("arank", row_number().over(wAdc))
      .filter(col("arank") <= pool * k)
      .select(col("query_id"), col("item_id"))
    // exact cosine re-rank on the candidate pool only
    val scored = cand
      .join(corpus.select(col(corpusId).as("item_id"),
        col(corpusVec).as("item_vec")), Seq("item_id"))
      .join(broadcast(queries.select(col(queryId).as("query_id"),
        col(queryVec).as("query_vec"))), Seq("query_id"))
      .withColumn("cosine", cosine(col("item_vec"), col("query_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("item_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("item_id"), col("cosine"), col("rank"))
  }
}
