package graft.engine

import org.apache.spark.sql.SparkSession

import graft.queries.{CalibrationStore, ChunkIndex, ContainmentStore, IvfIndex, KmvStore, ManifestStore, MinHashIndex, PHashIndex, VerdictStore}

/** One maintenance tick across every persisted index store — the
  * single documented cron body for a deployment that runs all nine
  * build-once/query-many stores (IVF vectors, MinHash bands, content
  * chunks, dedup verdicts, containment state, manifest components,
  * calibration histograms, perceptual image hashes, KMV source
  * sketches). Each store already
  * owns its tick ([[IvfIndex.maintain]], [[MinHashIndex.maintain]],
  * [[ChunkIndex.maintain]], [[VerdictStore.maintain]],
  * [[ContainmentStore.maintain]]: heal-aware
  * compaction policy + health census); this composes them, pushes the
  * IVF health into the SERVING config (the q147 SQ re-rank width via
  * [[IvfIndex.sqRerankWidthFor]] off cell skew, and since round 16
  * the q166 ADC re-rank width via [[IvfIndex.pqRerankWidthFor]] off
  * the stored codes' crowding — the tick that measured the store
  * sets both knobs), and folds the per-store observables into one
  * alert list an operator pages on.
  *
  * Alerts are CUES, not actions — each names the out-of-band fix
  * that is deliberately not automated here (dedup passes rewrite the
  * corpus; append-heal belongs to the crashed appender's retry):
  *  - `ivf_skew_persists` — max cell skew still above the rebuild
  *    threshold AFTER the tick (a rebuild, if one ran, could not fix
  *    it): the skew is the DATA — a mass of near-identical vectors
  *    k-means cannot split — so the fix is a dedup pass (q92/q149),
  *    not another rebuild. Meanwhile serving stays correct because
  *    the pushed re-rank width already scales with this skew.
  *  - `minhash_diverged` — a half-committed append (docs/bands epoch
  *    sets differ): nothing was folded; the crashed appender's
  *    retry (or `appendEpoch` for the missing half) heals it.
  *  - `minhash_capped_postings` — the capped-posting fraction crossed
  *    `cappedPostAlert`: a growing share of the corpus is reachable
  *    only through bucket representatives (recall risk documented at
  *    [[MinHashIndex.bucketStats]]); dedup the resident corpus
  *    (q100/q149) or raise the bucket cap.
  *  - `chunkstore_dup_heavy` — the duplicated-occurrence fraction
  *    crossed `dupOccAlert`: boilerplate is accumulating; run the
  *    q138 removal pass over the store's consumers.
  *  - `verdictstore_diverged` — the verdict store's sigs/verdicts
  *    epoch sets differ (half-committed append): same contract as
  *    `minhash_diverged`, the appender's retry heals it.
  *  - `containment_diverged` — any of the containment store's four
  *    tables' epoch sets differ: same contract again.
  *  - `containment_gc_heavy` — the superseded+dead row fraction
  *    crossed `supersededAlert` while under the epoch-count policy:
  *    df-crossing appends are churning resident rows faster than the
  *    fold cadence; lower `maxEpochs` for this store or compact
  *    out-of-band.
  *  - `manifest_diverged` / `manifest_gc_heavy` — the manifest
  *    store's eight tables disagree (appender's retry heals) / its
  *    one mutable table's superseded fraction crossed the bound
  *    (bench-heavy appends churning resident contamination rows;
  *    same fix as containment_gc_heavy).
  *  - `calibration_diverged` — scores/hist epoch sets differ: the
  *    appender's retry heals (the hist delta derives from the
  *    committed scores epoch); if the scores side was folded
  *    out-of-band first, `CalibrationStore.rebuildHistogram` is the
  *    named recovery.
  *  - `phash_diverged` / `phash_bucket_over_cap` — hashes/bands epoch
  *    sets differ (appender's retry or `PHashIndex.rebuildBands`
  *    heals) / a band bucket crossed the probe cap: a mass of
  *    hash-identical assets is reachable only through its
  *    representative — dedup the images (q161's own verdict) or
  *    raise the cap.
  *
  * Single-maintenance-writer contract (inherited from each store):
  * run between micro-batches or with the append streams stopped.
  * Stores are independent — a deployment with a subset passes only
  * those paths and the rest of the report stays `None`.
  */
object Maintenance {

  /** The store paths one deployment maintains. */
  final case class Stores(ivf: Option[String] = None,
                          minhash: Option[String] = None,
                          chunks: Option[String] = None,
                          verdicts: Option[String] = None,
                          containment: Option[String] = None,
                          manifest: Option[String] = None,
                          calibration: Option[String] = None,
                          phash: Option[String] = None,
                          kmv: Option[String] = None)

  /** What the composed tick did, saw, and decided: the three
    * per-store reports (as run), the serving-config push-down
    * (`sqRerankWidth` — feed it to [[IvfIndex.sqQuery]]; the base
    * default when no IVF store is ticked), and the alert cues.
    */
  final case class Report(ivf: Option[IvfIndex.MaintenanceReport],
                          minhash: Option[MinHashIndex.MaintenanceReport],
                          chunks: Option[ChunkIndex.MaintenanceReport],
                          verdicts: Option[VerdictStore.MaintenanceReport],
                          containment: Option[ContainmentStore.MaintenanceReport],
                          manifest: Option[ManifestStore.MaintenanceReport],
                          calibration: Option[CalibrationStore.MaintenanceReport],
                          phash: Option[PHashIndex.MaintenanceReport],
                          kmv: Option[KmvStore.MaintenanceReport],
                          sqRerankWidth: Int,
                          pqRerankWidth: Int,
                          alerts: Seq[String])

  def tick(spark: SparkSession, stores: Stores,
           maxEpochs: Int = 64,
           ivfSkewAlert: Double = 4.0,
           cappedPostAlert: Double = 0.05,
           dupOccAlert: Double = 0.5,
           supersededAlert: Double = 0.5): Report = {
    val ivfR = stores.ivf.map(p =>
      IvfIndex.maintain(spark, p, maxEpochs = maxEpochs,
        maxSkew = ivfSkewAlert))
    val mhR = stores.minhash.map(p =>
      MinHashIndex.maintain(spark, p, maxEpochs = maxEpochs))
    val chR = stores.chunks.map(p =>
      ChunkIndex.maintain(spark, p, maxEpochs = maxEpochs))
    val vsR = stores.verdicts.map(p =>
      VerdictStore.maintain(spark, p, maxEpochs = maxEpochs))
    val ctR = stores.containment.map(p =>
      ContainmentStore.maintain(spark, p, maxEpochs = maxEpochs))
    val mfR = stores.manifest.map(p =>
      ManifestStore.maintain(spark, p, maxEpochs = maxEpochs))
    val cbR = stores.calibration.map(p =>
      CalibrationStore.maintain(spark, p, maxEpochs = maxEpochs))
    val phR = stores.phash.map(p =>
      PHashIndex.maintain(spark, p, maxEpochs = maxEpochs))
    // no alert cues: a KMV sketch cannot degrade or diverge (exact
    // function of the hash set seen; single-table appends have no
    // half-committed state) — the tick only bounds listing cost
    val kmvR = stores.kmv.map(p =>
      KmvStore.maintain(spark, p, maxEpochs = maxEpochs))
    val width = IvfIndex.sqRerankWidthFor(
      ivfR.map(_.maxSkew).getOrElse(Double.NaN))
    // the ADC tier's counterpart knob, driven by the code-crowding
    // half of pqHealth the same tick already measured (round 16 —
    // completes for pqQuery what the sq width push-down closed)
    val pqWidth = IvfIndex.pqRerankWidthFor(
      ivfR.map(_.maxCodeFrac).getOrElse(Double.NaN))
    val alerts = Seq.newBuilder[String]
    ivfR.foreach { r =>
      if (!r.maxSkew.isNaN && r.maxSkew > ivfSkewAlert)
        alerts += f"ivf_skew_persists:${r.maxSkew}%.2f"
    }
    mhR.foreach { r =>
      if (r.diverged) alerts += "minhash_diverged"
      if (r.cappedPostFrac > cappedPostAlert)
        alerts += f"minhash_capped_postings:${r.cappedPostFrac}%.4f"
    }
    chR.foreach { r =>
      if (r.dupOccurrenceFrac > dupOccAlert)
        alerts += f"chunkstore_dup_heavy:${r.dupOccurrenceFrac}%.4f"
    }
    vsR.foreach { r =>
      // same cue as minhash_diverged: a half-committed append whose
      // heal belongs to the appender's retry, never to this cron
      if (r.diverged) alerts += "verdictstore_diverged"
    }
    ctR.foreach { r =>
      if (r.diverged) alerts += "containment_diverged"
      else if (r.supersededFrac > supersededAlert)
        alerts += f"containment_gc_heavy:${r.supersededFrac}%.4f"
    }
    mfR.foreach { r =>
      if (r.diverged) alerts += "manifest_diverged"
      else if (r.supersededFrac > supersededAlert)
        alerts += f"manifest_gc_heavy:${r.supersededFrac}%.4f"
    }
    cbR.foreach { r =>
      // same appender-owned heal contract as the other diverged cues
      if (r.diverged) alerts += "calibration_diverged"
    }
    phR.foreach { r =>
      if (r.diverged) alerts += "phash_diverged"
      else if (r.maxBucket > graft.queries.TextOps.MaxLshBucket)
        alerts += s"phash_bucket_over_cap:${r.maxBucket}"
    }
    Report(ivfR, mhR, chR, vsR, ctR, mfR, cbR, phR, kmvR, width, pqWidth,
      alerts.result())
  }

  /** The RUNNING-cron form of [[tick]]: wire the composed tick onto a
    * streaming append's epoch cadence. Wraps a `foreachBatch` body
    * (typically the `appendEpoch` calls of the stores named in
    * `stores`) so that after every `everyN`-th completed epoch the
    * tick runs in the SAME foreachBatch invocation, on the
    * micro-batch thread, strictly between that stream's epoch
    * appends.
    *
    * Single-writer by construction: a streaming query serializes its
    * foreachBatch invocations, so no append from THIS stream can
    * overlap the tick — which discharges the per-store
    * single-maintenance-writer contract exactly when this stream is
    * the ticked stores' only appender (the same exclusivity every
    * `appendStream` already requires). Ticking a store fed by a
    * DIFFERENT stream re-opens the race; don't.
    *
    * Cadence is at-least-once, like the appends: a crash between the
    * epoch commit and the tick re-runs both on redelivery. That is
    * safe because the epoch commit is idempotent by naming and the
    * tick is idempotent by policy — compaction under `maxEpochs`
    * committed epochs is a pure-read no-op, and the health census is
    * a read. Reports flow to `onReport` (the log/alert seam; default
    * drops them).
    */
  def onEpochCadence(spark: SparkSession, stores: Stores, everyN: Int,
                     onReport: Report => Unit = _ => (),
                     maxEpochs: Int = 64,
                     ivfSkewAlert: Double = 4.0,
                     cappedPostAlert: Double = 0.05,
                     dupOccAlert: Double = 0.5,
                     supersededAlert: Double = 0.5)
                    (body: (org.apache.spark.sql.DataFrame, Long) => Unit)
      : (org.apache.spark.sql.DataFrame, Long) => Unit = {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    (batch, batchId) => {
      body(batch, batchId)
      if ((batchId + 1) % everyN == 0)
        onReport(tick(spark, stores, maxEpochs, ivfSkewAlert,
          cappedPostAlert, dupOccAlert, supersededAlert))
    }
  }
}
