package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextHash, TextHashFunctions}

/** Distributed linear quality/domain classifier over hashed
  * bag-of-words features (the hashing trick) — the fastText-shaped
  * model-based filter of an LLM data pipeline (e.g. a "looks like
  * reference-quality text" screen), built so training is EXACTLY
  * reproducible:
  *
  *   - features: token → floorMod(fnv1a(token), dims) — no vocabulary
  *     to build, no driver-side dictionary, dims is the only knob;
  *   - training: BATCH perceptron. Each epoch scores every document
  *     under the current weights (one compiled map-side kernel pass,
  *     `BowScore` — no explode, no join), then aggregates one
  *     per-bucket update Σ label over the misclassified docs' tokens
  *     (one shuffle whose rows are (bucket, Σlabel) — at most `dims`
  *     rows reach the driver, metadata scale);
  *   - ALL-INTEGER arithmetic: scores, weights, and updates are
  *     Longs, so the fit is bit-identical under any partitioning,
  *     any evaluation order, and any cluster size — unlike float
  *     SGD, whose sums reorder. `referenceFit` is an independent
  *     single-machine implementation of the same spec; the gate
  *     requires weight-vector identity between the two paths.
  *
  * Per-example (online) perceptron is inherently sequential; the
  * batch variant trades per-epoch convergence speed for a fit that is
  * embarrassingly parallel and deterministic — the right trade at
  * corpus scale, where an epoch is one scan.
  */
object Classifier {

  final case class Model(dims: Int, weights: Array[Long], bias: Long,
                         epochsRun: Int) {
    def score(text: Column): Column =
      TextHashFunctions.bowScore(text, dims, weights, bias)
    def predict(text: Column): Column =
      when(score(text) >= 0L, 1).otherwise(-1)
  }

  /** Fit up to `epochs` batch-perceptron epochs on (textCol, labelCol)
    * with labelCol ∈ {+1, -1}, POCKETING the best epoch: full-batch
    * updates overshoot (epoch 1 starts all-misclassified, so the first
    * update is the entire class-centroid difference and later epochs
    * can oscillate around the boundary), so the returned model is the
    * weight vector of whichever epoch classified most training docs
    * correctly — the classic pocket algorithm, still all-integer and
    * still bit-identical to `referenceFit`. Ties keep the EARLIER
    * epoch (both paths scan epochs in order with a strict `>`).
    * Stops early when an epoch's net update is zero. The input is
    * localCheckpointed once: every epoch re-reads materialized rows,
    * not the upstream plan. */
  def fitBatch(df: DataFrame, textCol: String, labelCol: String,
               dims: Int = 256, epochs: Int = 5): Model = {
    require(dims > 0 && Integer.bitCount(dims) == 1,
      "Classifier.fitBatch: dims must be a positive power of two")
    // text itself never rides into the checkpoint: epochs only need
    // the label and the bucket array (ints), so the materialized
    // per-epoch input is bytes per document, not the document.
    // Coalesced toward ~32k rows per task first (r18, the Bpe-learner
    // sizing): every epoch schedules one stage over these partitions,
    // so a scan-parallelism partition count (32 near-empty tasks at
    // gate scale) pays 20× the task-launch floor for nothing. The fit
    // is integer sums — partitioning cannot change it.
    var base = df
      .select(col(labelCol).cast("long").as("__y"),
        TextHashFunctions.bowBuckets(col(textCol), dims).as("__b"))
      .localCheckpoint(false)
    val nRows = base.count()
    val parts0 = base.rdd.getNumPartitions
    val target = math.max(1L, math.min(parts0.toLong, nRows / 32768L + 1L)).toInt
    if (target < parts0) {
      val prev = base
      base = base.coalesce(target).localCheckpoint(true)
      prev.unpersist()
    }
    val w = new Array[Long](dims)
    var bias = 0L
    var pocketW = w.clone(); var pocketBias = bias; var pocketCorrect = -1L
    var e = 0
    var converged = false
    while (e < epochs && !converged) {
      // score from the checkpointed bucket arrays — bit-identical to
      // bowScore(__text) but skips re-tokenizing/re-hashing the corpus
      // on every epoch (the old per-epoch hot cost)
      val scored = base.withColumn("__s",
        TextHashFunctions.bowScoreBuckets(col("__b"), w.clone(), bias))
      // ONE job per epoch (r13; was two): the pocket-accuracy count
      // rides the delta aggregation as sentinel bucket −2 — a
      // correctly-classified doc emits only (−2, +1), a misclassified
      // one its buckets plus the bias sentinel −1 with its label, and
      // a single groupBy-sum returns ≤ dims+3 rows. Same integer sums
      // in the same order as the two-job schedule, so the fit stays
      // bit-identical to referenceFit.
      val rows = scored
        .select(col("__y"),
          explode(when(col("__y") * col("__s") > 0L, array(lit(-2)))
            .otherwise(concat(col("__b"), array(lit(-1))))).as("__k"))
        .groupBy(col("__k"))
        .agg(sum(when(col("__k") === -2, lit(1L)).otherwise(col("__y"))).as("__d"))
        .collect()
      val correct = rows.find(_.getInt(0) == -2).map(_.getLong(1)).getOrElse(0L)
      if (correct > pocketCorrect) {
        pocketCorrect = correct; pocketW = w.clone(); pocketBias = bias
      }
      val deltas = rows.filter(_.getInt(0) != -2)
      val biasDelta = deltas.find(_.getInt(0) == -1).map(_.getLong(1)).getOrElse(0L)
      // converged = the NET update is zero (mirrors referenceFit: a
      // +1/-1 misclassified pair over identical tokens nets to zero)
      if (deltas.forall(_.getLong(1) == 0L) && biasDelta == 0L) converged = true
      else {
        deltas.foreach(r => if (r.getInt(0) >= 0) w(r.getInt(0)) += r.getLong(1))
        bias += biasDelta
        e += 1
      }
    }
    // the post-loop weights are one more candidate (the final update
    // was applied but never evaluated)
    val finalCorrect = base.filter(col("__y") *
      TextHashFunctions.bowScoreBuckets(col("__b"), w.clone(), bias) > 0L).count()
    if (finalCorrect > pocketCorrect) { pocketW = w.clone(); pocketBias = bias }
    base.unpersist()
    Model(dims, pocketW, pocketBias, e)
  }

  /** Independent driver-side reference implementation (same spec, no
    * Spark) for the gate's cross-path identity check: batch updates
    * accumulated over the epoch, applied once at epoch end, same
    * hash/bucket kernel (TextHash.bucket), same early stop. */
  def referenceFit(docs: Seq[(String, Long)], dims: Int,
                   epochs: Int = 5): Model = {
    val feats = docs.map { case (text, y) =>
      (TextHash.tokenize(
          org.apache.spark.unsafe.types.UTF8String.fromString(text))
        .filter(_.nonEmpty).map(TextHash.bucket(_, dims)), y)
    }
    val w = new Array[Long](dims)
    var bias = 0L
    var pocketW = w.clone(); var pocketBias = bias; var pocketCorrect = -1L
    def countCorrect(): Long =
      feats.count { case (buckets, y) =>
        var s = bias
        buckets.foreach(k => s += w(k))
        y * s > 0L
      }.toLong
    var e = 0
    var converged = false
    while (e < epochs && !converged) {
      val correct = countCorrect()
      if (correct > pocketCorrect) {
        pocketCorrect = correct; pocketW = w.clone(); pocketBias = bias
      }
      val delta = new Array[Long](dims)
      var biasDelta = 0L
      feats.foreach { case (buckets, y) =>
        var s = bias
        buckets.foreach(k => s += w(k))
        if (y * s <= 0L) {
          buckets.foreach(k => delta(k) += y)
          biasDelta += y
        }
      }
      if (delta.forall(_ == 0L) && biasDelta == 0L) converged = true
      else {
        var i = 0
        while (i < dims) { w(i) += delta(i); i += 1 }
        bias += biasDelta
        e += 1
      }
    }
    if (countCorrect() > pocketCorrect) { pocketW = w.clone(); pocketBias = bias }
    Model(dims, pocketW, pocketBias, e)
  }
}
