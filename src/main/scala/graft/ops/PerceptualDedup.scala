package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.TableStore

/** Incremental PERCEPTUAL dedup against a persistent corpus index —
  * the media counterpart of [[IncrementalDedup]]: dedup each ingest
  * batch of images/audio/video against every payload KEPT so far,
  * without re-hashing or re-scanning the kept corpus.
  *
  * Design vs the MinHash index: a perceptual signature is ONE 64-bit
  * hash (image dHash / audio energy fingerprint / video frame
  * majority), so the full hash rides on every bucket row —
  * (band, bucket, id, h) = 28 bytes — and collision verification is an
  * inline `bit_count(xor)` on the SAME row the band join produced. No
  * second signature table, no second join, no bands-then-sigs crash
  * ordering: one table, one atomic commit per batch.
  *
  * Per batch: hash once (cached), within-batch greedy min-id drop via
  * the shared [[Dedup.hammingBand64Pairs]] machinery, then a
  * band-bucket equi-join against the index (index side skew-capped:
  * each batch row joins at most `maxBucket` kept rows — linear in the
  * batch) with the Hamming verify inline; survivors' band rows append
  * to the index and the surviving input rows return MATERIALIZED.
  * Cost per batch is O(batch × 4 bands) + collided buckets —
  * independent of corpus size except through bucket occupancy, which
  * `maxBucket` caps. Payloads that fail to decode hash to null and
  * PASS THROUGH un-indexed (can't dedup what can't be decoded; same
  * skip-crud contract as the pair operators — they also never enter
  * the index, so they can never drop a future payload).
  *
  * Known hot-bucket limitation (shared with [[IncrementalDedup]]): a
  * single NOVEL content family larger than `maxBucket` saturates its
  * index bucket, after which `capBuckets` excludes that bucket from
  * future collision joins and later copies leak. Run the standard
  * upstream exact-dedup pass first (identical payloads share ALL
  * bands) and size `maxBucket` above the largest expected legitimate
  * near-dup family.
  *
  * Cross-batch semantics mirror [[IncrementalDedup]], spec-locked the
  * same way: a doc drops only for a KEPT near-dup, so with batches in
  * nondecreasing id order the incremental survivors are a SUPERSET of
  * the one-shot greedy (drop-id2-of-any-pair) survivors.
  *
  * The reference has no media surface at all; this composes the
  * perceptual kernels with the version-manifest store (the LAION-style
  * ingest-time image dedup loop, as a library op).
  */
final class PerceptualDedupIndex private (
    val buckets: TableStore, hash: Column => Column,
    maxHamming: Int, maxBucket: Int) {

  private def hashed(batch: DataFrame, idCol: String, binCol: String): DataFrame =
    batch.select(col(idCol).as("id"), hash(col(binCol)).as("h"))
      .filter(col("h").isNotNull)

  /** (band, bucket, id, h) rows — 4 per hashed payload. */
  private def banded(h: DataFrame): DataFrame =
    h.select(col("id"), col("h"),
        posexplode(array((0 until 4).map(b =>
          shiftrightunsigned(col("h"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .select(col("pos").as("band"), col("col").as("bucket"), col("id"), col("h"))

  /** Dedup one ingest batch against the index (and itself); append the
    * survivors' band rows; return the surviving rows of `batch` with
    * all original columns, MATERIALIZED (localCheckpoint — the append
    * already executed the lineage; a lazy recompute would re-decode
    * every payload and re-read index snapshots that have since moved).
    *
    * IDEMPOTENT under at-least-once re-delivery (the foreachBatch
    * retry contract): survivors never vanish on replay — a kept
    * payload matches only OTHER kept payloads, never its own
    * first-attempt index entry (self-matches are excluded in the
    * collision join; a payload is a duplicate of a DIFFERENT kept
    * payload, not of its own identity — without this, a retried
    * micro-batch would collide with itself at Hamming 0 and silently
    * vanish). Pass `txn = Some((appId, batchId))` — foreachBatch hands
    * you the batchId — to ALSO make the index append exactly-once
    * through the store's atomic txn marker (O(1) metadata, no data
    * scan): a replayed batch then leaves the index byte-identical.
    * Without a token, a replayed batch re-appends its survivors' band
    * rows PERMANENTLY (compact() rewrites files, it does not
    * deduplicate rows) and the duplicates inflate bucket-occupancy
    * counts toward the `maxBucket` cutoff — any source that can
    * replay should pass the token. One corner is inherently
    * non-idempotent either way: if the first attempt's own appends
    * push an index bucket past `maxBucket`, the replay's collision
    * join no longer sees that bucket and a payload dropped on attempt
    * one can survive the replay — keep `maxBucket` well above real
    * bucket occupancy (see the class doc's hot-bucket note). */
  def dedupBatch(batch: DataFrame, idCol: String, binCol: String,
                 txn: Option[(String, Long)] = None): DataFrame = {
    val h = hashed(batch, idCol, binCol).cache()
    try {
      // ONE committed snapshot serves the emptiness probe and the
      // collision join — concurrent commits can't tear the view
      val idxOpt = (if (buckets.exists) Some(buckets.read) else None)
        .filterNot(_.isEmpty)

      // stage 1 — within-batch greedy min-id drop: id2 of any pair
      // within maxHamming drops (same rule as the one-shot pair ops)
      val withinDropped = Dedup.hammingBand64Pairs(h, maxHamming, maxBucket)
        .select(col("id2").as("id")).distinct()

      // stage 2 — collisions vs the KEPT corpus: band equi-join with
      // the Hamming verify INLINE (the index row carries the hash).
      // Skew cap on the INDEX side only: each batch row then joins at
      // most maxBucket kept rows — linear in the batch, no quadratic
      // term. The batch side must stay UNCAPPED: capping it would drop
      // a duplicate-flood batch's hot buckets from the comparison
      // entirely, letting the whole flood bypass the index check and
      // poison the index with >maxBucket copies of kept content.
      val indexDropped: DataFrame = idxOpt match {
        case None => h.limit(0).select(col("id"))
        case Some(idx) =>
          banded(h)
            .join(Dedup.capBuckets(idx, Seq("band", "bucket"), maxBucket)
              .select(col("band"), col("bucket"), col("id").as("kept_id"),
                col("h").as("kept_h")),
              Seq("band", "bucket"))
            .filter(col("kept_id") =!= col("id") &&
              bit_count(col("h").bitwiseXOR(col("kept_h"))) <= maxHamming)
            .select(col("id")).distinct()
      }

      val survivors = batch.join(
          withinDropped.unionByName(indexDropped).distinct()
            .withColumnRenamed("id", idCol),
          Seq(idCol), "left_anti")
        .localCheckpoint(true) // pin: the caller must not re-run the pass

      val survivorBands = banded(
        h.join(survivors.select(col(idCol).as("id")), Seq("id"), "left_semi"))
      txn match {
        case None => buckets.append(survivorBands)
        case Some((appId, batchId)) => // replay re-appends NOTHING: O(1) marker check
          buckets.appendOnce(appId, batchId, survivorBands); ()
      }
      survivors
    } finally { h.unpersist(); () }
  }

  /** READ-ONLY near-dup lookup — "is this payload already
    * (perceptually) in the corpus?" as a query, not an ingest step:
    * the same band join + inline Hamming verify, nothing appended.
    * Returns one (probe id, kept_id, hamming) row per hit.
    * Snapshot-isolated like every TableStore read. */
  def probe(batch: DataFrame, idCol: String, binCol: String): DataFrame = {
    val h = hashed(batch, idCol, binCol).cache()
    try {
      val empty = h.limit(0).select(col("id").as(idCol),
        col("id").as("kept_id"), lit(0).as("hamming"))
      (if (buckets.exists) Some(buckets.read) else None).filterNot(_.isEmpty) match {
        case None => empty.localCheckpoint(true)
        case Some(idx) => banded(h)
          .join(Dedup.capBuckets(idx, Seq("band", "bucket"), maxBucket)
            .select(col("band"), col("bucket"), col("id").as("kept_id"),
              col("h").as("kept_h")),
            Seq("band", "bucket"))
          .withColumn("hamming",
            bit_count(col("h").bitwiseXOR(col("kept_h"))).cast("int"))
          .filter(col("hamming") <= maxHamming)
          .select(col("id").as(idCol), col("kept_id"), col("hamming"))
          .dropDuplicates(idCol, "kept_id")
          .localCheckpoint(true) // pin before the hash cache drops
      }
    } finally { h.unpersist(); () }
  }

  /** Off-hot-path maintenance: rewrite the index clustered by
    * (band, bucket) so a batch's collision join prunes to the files
    * its buckets land in. Appends stay O(batch); run at the cadence
    * small-file pressure dictates. Old versions remain until
    * [[vacuum]]. */
  def compact(targetFiles: Int = 8): Unit =
    buckets.compact(targetFiles, clusterBy = Seq("band", "bucket"))

  /** Reclaim superseded index versions (`graceMs = 0` keeps only the
    * latest snapshot). */
  def vacuum(graceMs: Long = 10 * 60 * 1000L): Unit =
    buckets.vacuum(graceMs)
}

object PerceptualDedupIndex {
  private val bucketSchema = StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("h", LongType, nullable = false)))

  private val kernels: Map[String, Column => Column] = Map(
    "image" -> graft.functions.ImageHashFunctions.dhash64,
    "audio" -> graft.functions.MediaHashFunctions.audioFp64,
    "video" -> graft.functions.MediaHashFunctions.videoDHash64)

  /** Open (or create) a perceptual-dedup index rooted at `dir`. The
    * MODALITY (which kernel hashed the kept corpus) is pinned in a
    * params file at creation — reopening an image index as "audio"
    * would compare hashes from different kernels and silently let
    * duplicates through, so it throws instead. `maxHamming`/`maxBucket`
    * are per-open dials. Pin I/O goes through the same Hadoop
    * FileSystem as the TableStore (tmp+rename, concurrent-create safe)
    * for the same reasons as [[IncrementalDedup.open]]. */
  def open(spark: SparkSession, dir: String, modality: String,
           maxHamming: Int = 6, maxBucket: Int = 1000): PerceptualDedupIndex = {
    val kernel = kernels.getOrElse(modality,
      throw new IllegalArgumentException(
        s"unknown modality '$modality' (expected one of ${kernels.keys.mkString("/")})"))
    import org.apache.hadoop.fs.Path
    val hdir = new Path(dir)
    val fs = hdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val paramsPath = new Path(hdir, "_dedup_params")
    val want = s"modality=$modality,hashfmt=1"
    def readPin(): String = {
      val in = fs.open(paramsPath)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    }
    def requirePin(have: String): Unit = require(have == want,
      s"index at $dir was built with [$have]; reopening with [$want] would " +
        "compare hashes from different kernels")
    if (fs.exists(paramsPath)) requirePin(readPin())
    else {
      fs.mkdirs(hdir)
      val tmp = new Path(hdir, s".params-${java.util.UUID.randomUUID().toString.take(8)}")
      val out = fs.create(tmp, false)
      try out.write(want.getBytes("UTF-8")) finally out.close()
      if (!fs.rename(tmp, paramsPath)) {
        fs.delete(tmp, false)
        requirePin(readPin())
      }
    }
    val buckets = new TableStore(spark, s"$dir/buckets", "id")
    buckets.initialize(bucketSchema)
    new PerceptualDedupIndex(buckets, kernel, maxHamming, maxBucket)
  }
}
