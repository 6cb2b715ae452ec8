"""Multimodal column plumbing: opaque ``binary`` media payloads with
typed metadata, decoded / feature-extracted via Arrow-batched UDFs.

The interleaved-span documents carry ``kind='media'`` spans
(``media_ref`` URLs — e.g. KML icon hrefs). This module provides the
Spark-side pipeline a training-data job needs over such columns:

- :func:`media_table` — spans → one row per media reference with typed
  metadata (doc_id, media_ref, ext, offset) — pure Column ops (explode +
  filter), no Python.
- :func:`fetch_media_stub` — attaches a ``content binary`` column. Real
  fetching/decoding needs network + codec libraries that are NOT in this
  environment, so the default payload generator is a deterministic fake
  (seeded bytes from the ref hash); pass ``strict=True`` to get the
  honest ``NotImplementedError`` path. The Spark plumbing — schema,
  batching, partitioning — is real and tested.
- :func:`media_features` — binary → fixed-width float feature vector
  (batched numpy over Arrow; stands in for an image/audio encoder).
- :func:`sample_frames` — binary video stand-in → N deterministic frame
  slices with (frame_idx, frame binary) rows, the explode shape a real
  frame sampler produces.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = "doc_id string, media_ref string, ext string, offset int"


def media_table(documents_kml: DataFrame) -> DataFrame:
    """documents_kml(doc_id, spans) → (doc_id, media_ref, ext, offset):
    explode + filter on span kind, extension parsed with JVM string fns."""
    s = (documents_kml
         .select("doc_id", F.explode("spans").alias("s"))
         .where(F.col("s.kind") == "media")
         .select("doc_id",
                 F.col("s.media_ref").alias("media_ref"),
                 F.col("s.offset").alias("offset")))
    ext = F.lower(F.element_at(F.split(F.col("media_ref"), r"\."), -1))
    return s.withColumn("ext", ext).select("doc_id", "media_ref", "ext", "offset")


def _fake_payload(ref: str, size: int = 4096) -> bytes:
    seed = int.from_bytes(hashlib.md5(ref.encode()).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size, dtype=np.uint8).tobytes()


def _md5_chain(ref: str, n: int) -> bytes:
    """First ``n`` bytes of the digest chain md5(ref:0) || md5(ref:1)
    || ... — the ONE byte-source definition shared with the DuckDB
    oracle (which replays ``md5(media_ref || ':' || i)`` per 16-byte
    chunk), so decoded-pixel checksums are bit-exact cross-engine."""
    chunks = [hashlib.md5(f"{ref}:{i}".encode()).digest()
              for i in range((n + 15) // 16)]
    return b"".join(chunks)[:n]


def _ppm_payload(ref: str, width: int, height: int) -> bytes:
    """A real binary PPM (P6) image whose pixel bytes come from the
    md5 chain of the ref — a stdlib-only stand-in for a fetched image
    that a REAL header-parsing decoder must decode."""
    body = _md5_chain(ref, width * height * 3)
    return b"P6\n%d %d\n255\n" % (width, height) + body


def parse_ppm(blob: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a binary PPM (P6): parse the ASCII header (magic, width,
    height, maxval — whitespace separated, ``#`` comments allowed as
    per the netpbm spec), then read width*height*3 raw pixel bytes.
    Returns (width, height, maxval, uint8 pixel array). This is a true
    format decode, not a stub — malformed input raises ValueError."""
    if blob[:2] != b"P6":
        raise ValueError(f"not a P6 PPM (magic {blob[:2]!r})")
    idx, vals = 2, []
    while len(vals) < 3:
        while idx < len(blob) and blob[idx:idx + 1].isspace():
            idx += 1
        if blob[idx:idx + 1] == b"#":  # comment to end-of-line
            while idx < len(blob) and blob[idx:idx + 1] != b"\n":
                idx += 1
            continue
        start = idx
        while idx < len(blob) and not blob[idx:idx + 1].isspace():
            idx += 1
        vals.append(int(blob[start:idx]))
    idx += 1  # exactly one whitespace byte after maxval
    width, height, maxval = vals
    n = width * height * 3
    if len(blob) - idx < n:
        raise ValueError(f"truncated PPM: {len(blob) - idx} < {n} bytes")
    px = np.frombuffer(blob, dtype=np.uint8, count=n, offset=idx)
    return width, height, maxval, px


def fetch_media_stub(media: DataFrame, *, strict: bool = False,
                     payload_bytes: int = 4096, payload: str = "noise",
                     width: int = 16, height: int = 16) -> DataFrame:
    """Attach ``content binary``. STUB at the FETCH layer only: no
    network in this environment, so bytes are synthesized
    deterministically from the ref (same ref → same bytes, so
    downstream dedup/feature/decode tests are meaningful).

    ``payload`` picks the byte shape: ``"noise"`` — opaque rng bytes
    (the original stand-in); ``"ppm"`` — a REAL binary PPM image
    (md5-chain pixels, :func:`_ppm_payload`) that :func:`decode_ppm` /
    ``media_features(decode="ppm")`` genuinely parse; ``"pcm"`` —
    ``payload_bytes`` of raw md5-chain bytes read as int16-LE mono
    samples by :func:`pcm_window_features` (the audio-shaped lane —
    SQL-replayable, unlike ``"noise"``). ``strict=True`` raises
    NotImplementedError the way the real fetcher's unsupported-scheme
    branch would."""
    if payload not in ("noise", "ppm", "pcm"):
        raise ValueError(f"unknown payload mode {payload!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "media fetch requires network + codec libs; "
                    "not available in this environment")
            pdf = pdf.copy()
            if payload == "ppm":
                pdf["content"] = [_ppm_payload(r, width, height)
                                  for r in pdf["media_ref"]]
            elif payload == "pcm":
                pdf["content"] = [_md5_chain(r, payload_bytes)
                                  for r in pdf["media_ref"]]
            else:
                pdf["content"] = [_fake_payload(r, payload_bytes)
                                  for r in pdf["media_ref"]]
            yield pdf

    return media.mapInPandas(run, MEDIA_SCHEMA + ", content binary")


def decode_ppm(with_content: DataFrame) -> DataFrame:
    """Real image decode over the binary column: parse each PPM header
    + pixel payload (:func:`parse_ppm`, numpy — no codec libs needed)
    and emit exact integer checksums over the DECODED pixels:
    ``pixel_sum`` = Σ byte values, ``pixel_wsum`` = Σ (position+1)·byte.
    Integer arithmetic end-to-end, so the driver oracle (q43) checks
    the decode bit-exactly by replaying the md5 pixel chain in SQL.

    Output: (doc_id, media_ref, width, height, pixel_sum, pixel_wsum).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, sums, wsums = [], [], [], []
            for blob in pdf["content"]:
                w, h, _maxval, px = parse_ppm(bytes(blob))
                p64 = px.astype(np.int64)
                widths.append(w)
                heights.append(h)
                sums.append(int(p64.sum()))
                wsums.append(int(np.dot(np.arange(1, len(p64) + 1,
                                                  dtype=np.int64), p64)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "media_ref": pdf["media_ref"],
                                "width": widths, "height": heights,
                                "pixel_sum": sums, "pixel_wsum": wsums})

    return with_content.mapInPandas(
        run, "doc_id string, media_ref string, width int, height int, "
             "pixel_sum long, pixel_wsum long")


def media_features(with_content: DataFrame, *, dim: int = 16,
                   decode: str = "raw") -> DataFrame:
    """binary content → float feature vector (batched: one numpy
    reshape/mean per Arrow batch — the shape a real CNN/encoder UDF
    takes; the 'model' here is per-block means). ``decode="ppm"``
    runs the true PPM header+pixel decode (:func:`parse_ppm`) and
    features the DECODED pixel array; ``"raw"`` features the payload
    bytes as-is (opaque blobs)."""
    if decode not in ("raw", "ppm"):
        raise ValueError(f"unknown decode mode {decode!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob in pdf["content"]:
                if decode == "ppm":
                    arr = parse_ppm(bytes(blob))[3].astype(np.float32)
                else:
                    arr = np.frombuffer(blob, dtype=np.uint8).astype(np.float32)
                if len(arr) == 0:
                    # empty payload (failed fetch): zero vector, not NaN
                    feats.append([0.0] * dim)
                    continue
                pad = (-len(arr)) % dim
                if pad:
                    arr = np.pad(arr, (0, pad))
                feats.append((arr.reshape(dim, -1).mean(axis=1) / 255.0).tolist())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "feature": feats,
            })

    return with_content.mapInPandas(
        run, "doc_id string, media_ref string, feature array<float>")


def sample_frames(with_content: DataFrame, *, n_frames: int = 4) -> DataFrame:
    """Pretend the binary is a video container: emit ``n_frames`` evenly
    spaced byte-slice 'frames' per row — the (explode → per-frame row)
    plumbing of a real frame sampler, with deterministic fake decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, refs, idxs, frames = [], [], [], []
            for doc_id, ref, blob in zip(pdf["doc_id"], pdf["media_ref"],
                                         pdf["content"]):
                n = len(blob)
                step = max(n // n_frames, 1)
                for i in range(n_frames):
                    start = min(i * step, max(n - step, 0))
                    doc_ids.append(doc_id)
                    refs.append(ref)
                    idxs.append(i)
                    frames.append(blob[start:start + step])
            yield pd.DataFrame({"doc_id": doc_ids, "media_ref": refs,
                                "frame_idx": idxs, "frame": frames})

    return with_content.mapInPandas(
        run, "doc_id string, media_ref string, frame_idx int, frame binary")


def span_mix_stats(documents_kml: DataFrame) -> DataFrame:
    """Per-document interleaving statistics over the spans layout
    (doc_id, spans: array<struct<kind, text, media_ref, offset>> —
    the input_hint table shape): span counts by kind, total text
    characters, and the number of kind TRANSITIONS between consecutive
    spans (the interleaving signal — a doc with media scattered through
    its text transitions often; one with a media appendix doesn't).

    Pure array Columns — no explode, no shuffle, no Python: each
    statistic is one ``aggregate``/``zip_with`` fold over the array in
    whole-stage codegen, so the operator is a narrow map whatever the
    corpus size.

    Output: (doc_id, n_spans, n_media, text_chars, n_transitions).
    """
    kinds = F.transform("spans", lambda s: s["kind"])
    n_media = F.size(F.filter("spans", lambda s: s["kind"] == "media"))
    text_chars = F.aggregate(
        "spans", F.lit(0).cast("long"),
        lambda acc, s: acc + F.length(F.coalesce(s["text"], F.lit(""))))
    transitions = F.size(F.filter(
        F.zip_with(kinds, F.slice(kinds, 2, F.greatest(
            F.size(kinds) - 1, F.lit(0))), lambda a, b: a != b),
        lambda x: x))
    return documents_kml.select(
        "doc_id",
        F.size("spans").alias("n_spans"),
        n_media.alias("n_media"),
        text_chars.alias("text_chars"),
        transitions.alias("n_transitions"))


def frame_checksums(frames: DataFrame) -> DataFrame:
    """Exact integer checksums per sampled 'frame' —
    :func:`sample_frames`' verification tail: byte count, byte sum
    and position-weighted byte sum per (media_ref, frame_idx), all
    pure integers so the frame SLICING itself (offsets, step, tail
    clamp) is cross-engine checkable bit-exactly (driver-style
    oracle replays the md5 payload chain + the same slice
    arithmetic in SQL). The real-codec version of this tail is the
    per-frame feature extractor; the checksum stands in for it
    without codec libs (the q43 fetch-layer-stub discipline).

    Output: (media_ref, frame_idx, n_bytes, byte_sum, byte_wsum).
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arrs = [np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                    for b in pdf["frame"]]
            yield pd.DataFrame({
                "media_ref": pdf["media_ref"],
                "frame_idx": pdf["frame_idx"],
                "n_bytes": [len(a) for a in arrs],
                "byte_sum": [int(a.sum()) for a in arrs],
                "byte_wsum": [int((a * (np.arange(len(a)) + 1)).sum())
                              for a in arrs]})

    return frames.mapInPandas(
        run, "media_ref string, frame_idx int, n_bytes long, "
             "byte_sum long, byte_wsum long")


def pcm_window_features(with_content: DataFrame, *,
                        window: int = 64) -> DataFrame:
    """Audio-shaped feature extraction over the binary column — the
    PCM lane of the multimodal family beside the image
    (:func:`decode_ppm`) and video (:func:`sample_frames` →
    :func:`frame_checksums`) lanes: read ``content`` as int16
    LITTLE-ENDIAN mono samples and emit per-window integer acoustics
    — mean-absolute-amplitude numerator (``abs_sum``), peak
    (``peak``), and window-local ``zero_crossings`` (sign flips
    between consecutive samples, sign(0) = +1) — the
    energy/percussiveness signals a real audio curation pipeline
    gates on. Fetch-layer-stub discipline (q43): only the network
    fetch is stubbed (``payload="pcm"`` synthesizes the md5-chain
    bytes); the int16 decode and the windowed feature math here are
    REAL and run on any actual PCM bytes.

    Determinism: every output is an exact integer of the payload
    bytes (sample = b₀ + 256·b₁ − 65536·[b₁ ≥ 128]), so a
    driver-style oracle replays the md5 chain + the identical decode
    and window arithmetic in SQL, bit-exactly. A trailing partial
    window (and a trailing odd byte) is DROPPED — windows are
    fixed-size by contract so per-window stats are comparable.
    Crossings are window-local (no cross-window lag), keeping each
    window's row independent of its neighbors.

    Scale shape: Arrow-batched ``mapInPandas`` (vectorized numpy per
    batch, no per-row Python), embarrassingly parallel per media row,
    zero shuffle. Output rows = ⌊bytes/2/window⌋ per ref.

    Output: (media_ref, window_idx INT, n_samples INT, abs_sum
    BIGINT, peak BIGINT, zero_crossings BIGINT).
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, widx, nsamp, asum, peak, zc = [], [], [], [], [], []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                buf = bytes(content)
                n = (len(buf) // 2) * 2
                s = np.frombuffer(buf[:n], dtype="<i2").astype(np.int64)
                nw = len(s) // window
                if nw == 0:
                    continue
                w = s[:nw * window].reshape(nw, window)
                sign = np.where(w >= 0, 1, -1)
                flips = (sign[:, 1:] != sign[:, :-1]).sum(axis=1)
                refs += [ref] * nw
                widx += list(range(nw))
                nsamp += [window] * nw
                asum += [int(v) for v in np.abs(w).sum(axis=1)]
                peak += [int(v) for v in np.abs(w).max(axis=1)]
                zc += [int(v) for v in flips]
            yield pd.DataFrame({
                "media_ref": pd.Series(refs, dtype="object"),
                "window_idx": pd.Series(widx, dtype="int32"),
                "n_samples": pd.Series(nsamp, dtype="int32"),
                "abs_sum": pd.Series(asum, dtype="int64"),
                "peak": pd.Series(peak, dtype="int64"),
                "zero_crossings": pd.Series(zc, dtype="int64")})

    return with_content.mapInPandas(
        run, "media_ref string, window_idx int, n_samples int, "
             "abs_sum long, peak long, zero_crossings long")


def image_ahash(with_content: DataFrame) -> DataFrame:
    """Perceptual average-hash (aHash) over the DECODED image — the
    image lane's near-duplicate fingerprint beside the text family's
    :func:`~kml2geojson_spark.textops.simhash_near_pairs`: decode the
    PPM (:func:`parse_ppm` — a true format decode), grayscale each
    pixel as the exact integer channel sum r+g+b (scale-free: the
    mean comparison below is division-free), reduce to an 8×8 block
    grid, and set bit i when block i's mean is ≥ the image mean —
    compared as ``block_sum·64 ≥ total_sum``, EXACT integers, no
    float anywhere, so the hash is bit-identical cross-engine and the
    DuckDB oracle replays it from the md5 pixel chain.

    The 64 bits are emitted as four 16-bit band values (``b0..b3``,
    block index ``16·j + i`` → bit ``i`` of band ``j``) — the shape
    :func:`image_ahash_pairs`' banded self-join consumes directly,
    and sign-safe in every engine (no 2⁶³ BIGINT edge).

    Width and height must each be divisible by 8 (raises otherwise).
    Arrow-batched ``mapInPandas``, zero shuffle.

    Output: (doc_id, media_ref, b0 INT, b1 INT, b2 INT, b3 INT).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": pdf["doc_id"],
                   "media_ref": pdf["media_ref"]}
            bands: list[list[int]] = [[], [], [], []]
            for blob in pdf["content"]:
                w, h, _maxval, px = parse_ppm(bytes(blob))
                if w % 8 or h % 8:
                    raise ValueError(
                        f"image_ahash needs 8-divisible dims, got {w}x{h}")
                gray = px.astype(np.int64).reshape(h, w, 3).sum(axis=2)
                bs = gray.reshape(8, h // 8, 8, w // 8).sum(axis=(1, 3))
                bits = (bs * 64 >= gray.sum()).astype(np.int64).ravel()
                weights = np.int64(1) << np.arange(16, dtype=np.int64)
                for j in range(4):
                    bands[j].append(int(
                        (bits[16 * j:16 * j + 16] * weights).sum()))
            for j in range(4):
                out[f"b{j}"] = pd.Series(bands[j], dtype="int32")
            yield pd.DataFrame(out)

    return with_content.mapInPandas(
        run, "doc_id string, media_ref string, "
             "b0 int, b1 int, b2 int, b3 int")


def image_ahash_pairs(hashes: DataFrame, *, max_hamming: int = 3,
                      id_col: str = "doc_id") -> DataFrame:
    """Image near-duplicate pairs by aHash Hamming distance — the
    banded LSH self-join over :func:`image_ahash` output: candidates
    share at least one EQUAL 16-bit band (4 equi-join buckets, never
    all-pairs), then the exact Hamming distance Σ bit_count(bᵃ⊕bᵇ)
    filters to ≤ ``max_hamming``.  Pigeonhole-complete for
    ``max_hamming ≤ 3``: 4 bands can absorb at most 3 differing bits
    without one band matching exactly (the simhash guarantee) —
    larger thresholds raise.

    Scale shape: explode to (band_idx, band_val) → one shuffle on the
    band key, per-bucket pairing, distinct on the ordered id pair;
    identical-image clusters of size k produce k² band candidates —
    collapse exact duplicates first on a dup-heavy corpus (the
    :func:`~kml2geojson_spark.textops.near_dedup_representatives`
    composition rule).

    Output: (id_a, id_b, hamming INT), id_a < id_b.
    """
    if not 0 <= max_hamming <= 3:
        raise ValueError(
            f"max_hamming must be in [0, 3] (4-band pigeonhole "
            f"completeness), got {max_hamming}")
    base = hashes.select(F.col(id_col).alias("_id"),
                         "b0", "b1", "b2", "b3")
    expl = base.select(
        "_id",
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("bj"),
                     F.col(f"b{j}").alias("bv")) for j in range(4)]))
        .alias("_e")).select("_id", "_e.bj", "_e.bv")
    a = expl.select(F.col("_id").alias("id_a"), "bj", "bv")
    b = expl.select(F.col("_id").alias("id_b"), "bj", "bv")
    cand = (a.join(b, ["bj", "bv"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())
    ha = base.select(F.col("_id").alias("id_a"),
                     *[F.col(f"b{j}").alias(f"_a{j}") for j in range(4)])
    hb = base.select(F.col("_id").alias("id_b"),
                     *[F.col(f"b{j}").alias(f"_b{j}") for j in range(4)])
    ham = sum(F.bit_count(F.col(f"_a{j}").bitwiseXOR(F.col(f"_b{j}")))
              for j in range(4))
    return (cand.join(ha, "id_a").join(hb, "id_b")
            .withColumn("hamming", ham.cast("int"))
            .where(F.col("hamming") <= F.lit(int(max_hamming)))
            .select("id_a", "id_b", "hamming"))


def shot_boundaries(checksums: DataFrame, *,
                    threshold: int = 2000) -> DataFrame:
    """Shot-boundary detection over a :func:`frame_checksums` table:
    flag frames whose exact integer byte-sum jumps from the previous
    frame by more than ``threshold`` — the standard
    content-difference cut detector, here over the deterministic
    frame features (the real decoder would feed per-frame color
    histograms through the SAME plumbing; only the pixel source is
    synthetic, the :func:`fetch_media_stub` discipline).

    Determinism: one LAG window per media ref ordered by frame_idx;
    the jump is an exact BIGINT difference — bit-exact cross-engine.
    Frame 0 has no predecessor: jump NULL, never a boundary.

    Scale shape: ONE window hash-partitioned by media_ref (frames
    per ref are few — the partition is tiny), no join; composes
    directly after the mapInPandas decode stage.

    Output: (media_ref, frame_idx, byte_sum BIGINT, jump BIGINT,
    is_boundary BOOLEAN).
    """
    from pyspark.sql import Window
    w = Window.partitionBy("media_ref").orderBy(
        F.col("frame_idx").asc())
    jump = F.abs(F.col("byte_sum")
                 - F.lag("byte_sum", 1).over(w))
    return (checksums
            .select("media_ref", "frame_idx", "byte_sum",
                    jump.alias("jump"))
            .withColumn("is_boundary",
                        F.coalesce(F.col("jump") > F.lit(int(threshold)),
                                   F.lit(False))))
