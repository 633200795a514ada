package graft.model

import java.sql.Timestamp

/** Core row types of the crawl engine (SURVEY.md §1.2, BASELINE.json
  * input_hint). These mirror the *semantics* of the reference's dynamic
  * JSON dicts (reference: csinsights/data/types.py:69 `DatasetJsonDict`)
  * re-expressed as fixed Spark schemas — schema is declared up front,
  * never inferred in the hot path.
  */

/** Primary input table: image + caption pairs (BASELINE.json input_hint).
  * `bytes` is the encoded payload; `fmt` ∈ {bmp, png, xjpg} where `xjpg`
  * is the deterministic synthetic lossy codec (see [[graft.imagecodec]]).
  */
final case class ImageDoc(
    image_id: String,
    bytes: Array[Byte],
    w: Int,
    h: Int,
    fmt: String,
    caption: String,
    phash: Long)

/** A video row: the same opaque-binary + typed-metadata contract as
  * [[ImageDoc]] (BASELINE.json input_hint), with the payload a GVID
  * container ([[graft.imagecodec.VideoCodec]]) instead of a single
  * encoded image. */
final case class VideoDoc(
    video_id: String,
    bytes: Array[Byte],
    nframes: Int,
    fps: Int)

/** An audio row: the audio leg of the same contract — a GAUD PCM payload
  * ([[graft.imagecodec.AudioCodec]]) plus typed metadata. */
final case class AudioDoc(
    audio_id: String,
    bytes: Array[Byte],
    sample_rate: Int,
    n_samples: Int)

/** One frontier entry = one URL we may fetch.
  * Reference analog: an element of the ordered release-file URL list
  * (csinsights/client/s2client.py:146-157), where `seed_rank` is the
  * sequential fetch index that defines the reference's total order.
  */
final case class FrontierEntry(
    url: String,
    canonical_url: String,
    host: String,
    priority: Long,
    seed_rank: Long,
    discovered_at: Timestamp,
    depth: Int)

/** Result of a (simulated) fetch, with lineage for snapshot manifests.
  * Reference analog: the gzip blob written to disk + its md5 check
  * (csinsights/client/dblpclient.py:437-451).
  */
final case class FetchResult(
    url: String,
    canonical_url: String,
    host: String,
    status: Int,
    bytes: Array[Byte],
    md5: String,
    batch_id: Long,
    rank_in_batch: Int,
    image_id: String)

/** Exact URL-seen membership row (the verification-path twin of the
  * Bloom shards; SURVEY.md §7 step 4). */
final case class UrlSeen(canonical_url: String, first_batch_id: Long)

/** A dataset release (broadcastable dimension).
  * Reference analog: csinsights/client/dblpclient.py:384-399. */
final case class Release(url: String, name: String, ext: String)

/** robots.txt rule row (broadcast side; FIXTURES.md §3). */
final case class RobotsRule(host: String, path_prefix: String, allowed: Boolean)

/** Per-host politeness budget (FIXTURES.md §4). Reference-equivalence
  * mode = budget 1 for every host (sequential fetch semantics,
  * csinsights/client/s2client.py:153-156). */
final case class HostBudget(host: String, budget: Int)
