"""Multimodal columns: images / audio / video as opaque binary payloads
with typed metadata, processed via Arrow-batched mapInPandas.

Design (the part that must be right at 100 TB):
- payloads are `binary` columns riding in the same row as their
  metadata — no sidecar files, so partition pruning / predicate
  pushdown on (kind, meta) prunes payload IO too (parquet lazy column
  reads; Iceberg: same, plus delete-file compaction);
- decode / feature-extract / resize / frame-sample run as mapInPandas
  over Arrow record batches: one Python worker call per ~10k rows, the
  decode loop vectorized per batch, output schema fixed and typed;
- partitioning: payload rows are salted by media_id so a handful of
  multi-GB videos can't skew a partition (repartitionByRange on
  media_id before heavy stages).

The heavyweight codecs (PIL/ffmpeg/librosa) are NOT in this container,
so the decode kernel is pluggable: `decoder=None` uses a clearly-marked
DETERMINISTIC FAKE (features derived from the payload's md5) so the
Spark-side plumbing — schema, batching, partitioning, UDF signature —
is real and tested; passing a real decoder callable swaps it in
unchanged.  Attempting `decoder="real"` without the libs raises
NotImplementedError.

REAL decode IS exercised in-sandbox for every modality, each via a
dependency-free kernel over genuine container bytes produced by a
pure-Catalyst writer (same mapInPandas plumbing, no stub anywhere in
these paths):
- image: `decoder="ppm"` — binary-PPM (P6) header parse + raw pixel
  `np.frombuffer`, grayscale strip means (`generate_ppm_media`);
- audio: `decoder="wav"` — RIFF/WAVE chunk walk (fmt/data, pad bytes),
  16-bit LE PCM decode, per-strip mean amplitude (`generate_wav_media`;
  the pytest cross-checks the parser against the stdlib `wave` writer);
- video: `y4m_frame_stats` — YUV4MPEG2 stream parse (header tokens,
  per-FRAME markers, C444/C420 plane carving), per-frame plane means
  (`generate_y4m_media`).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id long, kind string, payload binary, meta map<string,string>"
FEATURE_DIM = 8
FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes long, features array<float>"
)
FRAMES_SCHEMA = "media_id long, frame_idx int, frame_hash string"

_KIND_SIZES = {"image": 4096, "audio": 16384, "video": 65536}


def generate_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (pure Catalyst expressions:
    payload bytes = unhex(repeated md5 stream keyed by id/seed))."""
    kinds = list(_KIND_SIZES)
    karr = F.array(*[F.lit(k) for k in kinds])
    kind = F.element_at(karr, (F.col("id") % len(kinds) + 1).cast("int"))
    reps = F.element_at(
        F.array(*[F.lit(_KIND_SIZES[k] // 16) for k in kinds]),
        (F.col("id") % len(kinds) + 1).cast("int"),
    )
    payload = F.unhex(
        F.repeat(F.md5(F.concat_ws("-", F.col("id"), F.lit(seed))), reps)
    )
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.create_map(
            F.lit("seed"), F.lit(str(seed)),
            F.lit("codec"), F.lit("fake/deterministic"),
        ).alias("meta"),
    )


PPM_W, PPM_H = 16, 16


def generate_ppm_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic table of GENUINE binary-PPM (P6) images, built with
    pure Catalyst expressions: ASCII header + w*h*3 raw RGB bytes from
    an md5 byte stream keyed by (id, seed).  Any P6-compliant reader
    (PIL included) decodes these — they feed the real-decode kernel
    `ppm_image_features` end-to-end without optional dependencies."""
    header = F.lit(f"P6\n{PPM_W} {PPM_H}\n255\n").cast("binary")
    reps = (PPM_W * PPM_H * 3) // 16  # md5 emits 16 bytes per chunk
    # chunk index feeds each md5 so the raster is NOT one repeated
    # 16-byte block: rows/strips differ, and a decoder that mixed up
    # the strip axis or order would produce different features

    def _chunk(r):
        return F.md5(F.concat_ws("-", F.lit("ppm"), F.col("id"), F.lit(seed), r))

    pixels = F.unhex(
        F.array_join(F.transform(F.sequence(F.lit(0), F.lit(reps - 1)), _chunk), "")
    )
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.concat(header, pixels).alias("payload"),
        F.create_map(
            F.lit("seed"), F.lit(str(seed)), F.lit("codec"), F.lit("image/x-portable-pixmap")
        ).alias("meta"),
    )


def ppm_image_features(payload: bytes, kind: str, dim: int = FEATURE_DIM) -> np.ndarray:
    """REAL dependency-free image decode kernel (``decoder="ppm"``):
    parse the binary-PPM (P6) header, read the raw RGB pixel matrix,
    grayscale it, and emit `dim` horizontal-strip mean intensities in
    [0, 1].  Raises ValueError on malformed input (it is a real parser,
    not a fingerprint of the bytes).  Non-image kinds fall back to the
    deterministic fake, like the PIL kernel."""
    if kind != "image":
        return _fake_features(payload, dim)
    # header: "P6" <ws> width <ws> height <ws> maxval <single ws> raster
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if not 0 < maxval <= 255:
        # 2-byte-sample PPMs (maxval > 255) would silently misdecode
        # under a uint8 read; maxval 0 would divide by zero
        raise ValueError(f"unsupported PPM maxval {maxval} (need 1..255)")
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    gray = raster.reshape(h, w, 3).astype(np.float64).mean(axis=2)  # (h, w)
    strips = np.array_split(gray, dim, axis=0)
    # images shorter than `dim` rows yield empty strips -> 0, not NaN
    return np.asarray(
        [s.mean() / maxval if s.size else 0.0 for s in strips], dtype=np.float32
    )


WAV_SAMPLES = 512  # mono 16-bit samples per generated clip
WAV_RATE = 8000
_WAV_DATA_BYTES = WAV_SAMPLES * 2  # 1024 = 64 md5 chunks


def _wav_header(data_bytes: int, channels: int = 1, rate: int = WAV_RATE) -> bytes:
    """Canonical 44-byte RIFF/WAVE PCM header (16-bit)."""
    import struct

    block = channels * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_bytes)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, rate, rate * block, block, 16)
        + b"data"
        + struct.pack("<I", data_bytes)
    )


def generate_wav_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic table of GENUINE RIFF/WAVE PCM clips (mono, 16-bit
    LE, 8 kHz), built with pure Catalyst expressions: the constant
    44-byte header + WAV_SAMPLES*2 raw sample bytes from an md5 byte
    stream keyed (id, seed, chunk).  Any WAV reader (the stdlib `wave`
    module included — the pytest proves it) decodes these; they feed the
    real audio kernel `wav_audio_features` without optional deps."""
    header = F.lit(_wav_header(_WAV_DATA_BYTES))
    reps = _WAV_DATA_BYTES // 16

    def _chunk(r):
        return F.md5(F.concat_ws("-", F.lit("wav"), F.col("id"), F.lit(seed), r))

    pcm = F.unhex(
        F.array_join(F.transform(F.sequence(F.lit(0), F.lit(reps - 1)), _chunk), "")
    )
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.concat(header, pcm).alias("payload"),
        F.create_map(
            F.lit("seed"), F.lit(str(seed)), F.lit("codec"), F.lit("audio/wav;pcm_s16le")
        ).alias("meta"),
    )


def wav_audio_features(payload: bytes, kind: str, dim: int = FEATURE_DIM) -> np.ndarray:
    """REAL dependency-free audio decode kernel (``decoder="wav"``):
    walk the RIFF chunk list (honoring the odd-size pad byte), parse the
    fmt chunk (PCM, 16-bit required), decode the data chunk as int16 LE
    samples (channels averaged), and emit `dim` strip mean amplitudes
    normalized to [-1, 1).  Raises ValueError on malformed input — it is
    a real parser, not a fingerprint.  Non-audio kinds fall back to the
    deterministic fake, like the other kernels."""
    if kind != "audio":
        return _fake_features(payload, dim)
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = None
    data = None
    o = 12
    while o + 8 <= len(payload):
        cid = payload[o : o + 4]
        (csz,) = struct.unpack("<I", payload[o + 4 : o + 8])
        body = payload[o + 8 : o + 8 + csz]
        if cid == b"fmt ":
            audio_format, channels, _rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if audio_format != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV encoding (format={audio_format}, bits={bits}; "
                    "need PCM s16le)"
                )
            fmt = channels
        elif cid == b"data":
            if fmt is None:
                raise ValueError("WAV data chunk before fmt chunk")
            data = body
            break
        o += 8 + csz + (csz & 1)  # chunks are word-aligned: odd sizes pad
    if data is None:
        raise ValueError("WAV payload has no data chunk")
    samples = np.frombuffer(data, dtype="<i2", count=len(data) // 2)
    if fmt > 1:
        samples = samples[: len(samples) - len(samples) % fmt]
        mono = samples.reshape(-1, fmt).astype(np.float64).mean(axis=1)
    else:
        mono = samples.astype(np.float64)
    strips = np.array_split(mono, dim)
    # strip mean / 32768: for the generated clips (64 samples/strip)
    # the divisor is a power of two, so the float32 feature maps back
    # to its exact integer sample sum (the oracle relies on this)
    return np.asarray(
        [s.mean() / 32768.0 if s.size else 0.0 for s in strips], dtype=np.float32
    )


Y4M_W, Y4M_H, Y4M_FRAMES = 8, 8, 6
_Y4M_FRAME_BYTES = Y4M_W * Y4M_H * 3  # C444: Y, U, V planes each w*h
Y4M_STATS_SCHEMA = (
    "media_id long, frame_idx int, y_mean float, u_mean float, v_mean float"
)


def generate_y4m_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic table of GENUINE YUV4MPEG2 (y4m) uncompressed video
    streams — C444, 8x8, Y4M_FRAMES frames — via pure Catalyst: stream
    header + per-frame 'FRAME\\n' marker + 192 plane bytes carved from
    one md5 byte stream keyed (id, seed, chunk).  Real players (ffmpeg,
    mpv) accept this container; the kernel `y4m_frame_stats` parses it
    for real."""
    header = F.lit(f"YUV4MPEG2 W{Y4M_W} H{Y4M_H} F25:1 Ip A1:1 C444\n").cast("binary")
    marker = F.lit(b"FRAME\n")
    chunks_per_frame = _Y4M_FRAME_BYTES // 16  # 12

    def _frame(fidx):
        def _chunk(c):
            return F.md5(
                F.concat_ws(
                    "-", F.lit("y4m"), F.col("id"), F.lit(seed),
                    fidx * chunks_per_frame + c,
                )
            )

        planes = F.unhex(
            F.array_join(
                F.transform(F.sequence(F.lit(0), F.lit(chunks_per_frame - 1)), _chunk),
                "",
            )
        )
        return F.concat(marker, planes)

    body = F.concat(*[_frame(F.lit(i)) for i in range(Y4M_FRAMES)])
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.concat(header, body).alias("payload"),
        F.create_map(
            F.lit("seed"), F.lit(str(seed)), F.lit("codec"), F.lit("video/x-yuv4mpeg")
        ).alias("meta"),
    )


def _parse_y4m(payload: bytes) -> tuple[int, int, str, list[tuple[np.ndarray, ...]]]:
    """Real YUV4MPEG2 parser: header tokens, FRAME markers (with any
    per-frame params), C444/C420 plane carving.  Returns (w, h,
    colorspace, frames) where each frame is (Y, U, V) uint8 arrays."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = 0
    cs = "C420"  # the spec's default when no C tag is present
    for tok in payload[:nl].split(b" ")[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            cs = tok.decode("ascii")
    if w <= 0 or h <= 0:
        raise ValueError("YUV4MPEG2 header missing W/H")
    if cs.startswith("C444"):
        psizes = (w * h, w * h, w * h)
    elif cs.startswith("C420"):
        psizes = (w * h, (w // 2) * (h // 2), (w // 2) * (h // 2))
    else:
        raise ValueError(f"unsupported y4m colorspace {cs}")
    frames = []
    o = nl + 1
    while o < len(payload):
        if payload[o : o + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at offset {o}")
        fnl = payload.find(b"\n", o)  # frame line may carry params
        if fnl < 0:
            raise ValueError("unterminated FRAME header")
        o = fnl + 1
        planes = []
        for ps in psizes:
            if o + ps > len(payload):
                raise ValueError("truncated y4m frame")
            planes.append(np.frombuffer(payload, dtype=np.uint8, count=ps, offset=o))
            o += ps
        frames.append(tuple(planes))
    return w, h, cs, frames


def y4m_frame_stats(media: DataFrame) -> DataFrame:
    """REAL dependency-free video decode over mapInPandas: parse each
    YUV4MPEG2 payload, one output row per frame with per-plane mean
    intensities in [0, 1] (mean/255; for the generated 64-byte planes
    the float32 value maps back to the exact integer byte sum, which the
    oracle recomputes from the md5 stream).
    -> (media_id, frame_idx, y_mean, u_mean, v_mean)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ym, um, vm = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _, _, _, frames = _parse_y4m(bytes(payload))
                for i, (y, u, v) in enumerate(frames):
                    ids.append(mid)
                    idxs.append(i)
                    ym.append(np.float32(y.mean() / 255.0))
                    um.append(np.float32(u.mean() / 255.0))
                    vm.append(np.float32(v.mean() / 255.0))
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "y_mean": pd.Series(ym, dtype="float32"),
                 "u_mean": pd.Series(um, dtype="float32"),
                 "v_mean": pd.Series(vm, dtype="float32")}
            )

    return media.where(F.col("kind") == "video").mapInPandas(run, Y4M_STATS_SCHEMA)


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """DETERMINISTIC FAKE decode: md5(payload) -> dim float32 in [0,1).
    Stands in for image-embed / audio-fingerprint; NOT a real decoder."""
    dig = hashlib.md5(payload).digest()
    raw = (dig * ((dim * 4) // len(dig) + 1))[: dim * 4]
    ints = np.frombuffer(raw, dtype=np.uint32).astype(np.float64)
    return (ints / 2**32).astype(np.float32)


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], np.ndarray] | str | None = None,
) -> DataFrame:
    """mapInPandas feature extraction: (media_id, kind, payload, meta)
    -> (media_id, kind, n_bytes, features[FEATURE_DIM])."""
    if decoder == "real":
        try:
            import PIL  # noqa: F401
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "decoder='real' (PIL multi-format) requires PIL, not present "
                "in this environment; use decoder='ppm' for the dependency-"
                "free real binary-PPM kernel, decoder=None for the "
                "deterministic fake, or a callable(bytes, kind) -> np.ndarray"
            ) from e
        decoder = pil_image_features
    elif decoder == "ppm":
        decoder = ppm_image_features
    elif decoder == "wav":
        decoder = wav_audio_features
    decode = decoder if callable(decoder) else _fake_features_by_kind

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "features": [f.tolist() for f in feats],
                }
            )

    # range-partition on media_id first: payload sizes are skewed by
    # kind; range keeps per-task byte volume bounded at scale.
    return media.repartitionByRange(
        media.sparkSession.sparkContext.defaultParallelism, "media_id"
    ).mapInPandas(run, FEATURES_SCHEMA)


def _fake_features_by_kind(payload: bytes, kind: str) -> np.ndarray:
    return _fake_features(payload)


def pil_image_features(payload: bytes, kind: str, dim: int = FEATURE_DIM) -> np.ndarray:
    """REAL image decode kernel (used by ``decoder="real"`` when PIL is
    importable): decode the image bytes, grayscale, resize to a dim x 1
    thumbnail, features = pixel intensities / 255.  Audio/video kinds
    still fall back to the deterministic fake (their codecs — ffmpeg /
    librosa — are heavier deps than this container carries); the
    conditional test in tests/test_multimodal.py runs the image path
    end-to-end wherever PIL exists and skips otherwise."""
    if kind != "image":
        return _fake_features(payload, dim)
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload)).convert("L").resize((dim, 1))
    return (np.asarray(img, dtype=np.float64).reshape(-1) / 255.0).astype(np.float32)


def sample_frames(media: DataFrame, every_n_bytes: int = 16384) -> DataFrame:
    """Frame sampling for video payloads: one row per sampled frame
    offset with a content hash (stub kernel, real batching/schema).
    -> (media_id, frame_idx, frame_hash)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i, off in enumerate(range(0, len(payload), every_n_bytes)):
                    chunk = payload[off : off + every_n_bytes]
                    ids.append(mid)
                    idxs.append(i)
                    hashes.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame_hash": pd.Series(hashes, dtype="object")}
            )

    return media.where(F.col("kind") == "video").mapInPandas(run, FRAMES_SCHEMA)


def ppm_resize_stats(media: DataFrame, factor: int = 2) -> DataFrame:
    """REAL resize kernel (the brief's decode/extract/RESIZE/sample
    list): nearest-neighbor downsample every binary-PPM payload by
    `factor` — output pixel (y, x) = input pixel (factor·y, factor·x) —
    re-encoded as a VALID P6 payload inside the kernel (pytest
    round-trips it through the feature parser), with the gate hashing
    the EXACT integer channel sums of the resized raster.

    -> (media_id, out_w, out_h, sum_r, sum_g, sum_b): all integers —
    the oracle restates the md5 byte stream and the stride-grid pixel
    selection, so an off-by-one in the stride, a channel swap, or a
    header-offset bug breaks the hash.

    Scale shape: one Arrow-batched mapInPandas pass, ~1/factor² output
    bytes per image; the binary column never leaves the executor."""
    import pandas as pd

    fac = int(factor)

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:2] != b"P6":
                    raise ValueError("not a binary PPM (P6) payload")
                fields: list[int] = []
                i = 2
                while len(fields) < 3:
                    while i < len(b) and b[i : i + 1].isspace():
                        i += 1
                    if b[i : i + 1] == b"#":
                        while i < len(b) and b[i : i + 1] != b"\n":
                            i += 1
                        continue
                    j = i
                    while j < len(b) and not b[j : j + 1].isspace():
                        j += 1
                    fields.append(int(b[i:j]))
                    i = j
                i += 1
                w, h, maxval = fields
                raster = np.frombuffer(
                    b, dtype=np.uint8, count=w * h * 3, offset=i
                ).reshape(h, w, 3)
                small = raster[::fac, ::fac, :]
                oh, ow = small.shape[0], small.shape[1]
                sums = small.astype(np.int64).sum(axis=(0, 1))
                out.append(
                    (
                        int(mid),
                        int(ow),
                        int(oh),
                        int(sums[0]),
                        int(sums[1]),
                        int(sums[2]),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "out_w", "out_h", "sum_r", "sum_g", "sum_b"
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        run,
        schema=(
            "media_id long, out_w long, out_h long,"
            " sum_r long, sum_g long, sum_b long"
        ),
    )


def y4m_frame_sample(media: DataFrame, stride: int = 2) -> DataFrame:
    """REAL frame-sampling kernel (the brief's decode/extract/resize/
    FRAME-SAMPLE list): emit stats for every `stride`-th frame only
    (frame_idx % stride == 0) — the keyframe-thinning step a video
    pipeline runs before feature extraction.  Same per-plane means as
    y4m_frame_stats; the parse walks the stream (Y4M has no frame
    index; a seekable container would skip I/O, this skips compute and
    output volume).
    -> (media_id, frame_idx, y_mean, u_mean, v_mean)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ym, um, vm = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _, _, _, frames = _parse_y4m(bytes(payload))
                for i, (y, u, v) in enumerate(frames):
                    if i % stride:
                        continue
                    ids.append(mid)
                    idxs.append(i)
                    ym.append(np.float32(y.mean() / 255.0))
                    um.append(np.float32(u.mean() / 255.0))
                    vm.append(np.float32(v.mean() / 255.0))
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "y_mean": pd.Series(ym, dtype="float32"),
                 "u_mean": pd.Series(um, dtype="float32"),
                 "v_mean": pd.Series(vm, dtype="float32")}
            )

    return media.where(F.col("kind") == "video").mapInPandas(run, Y4M_STATS_SCHEMA)


AHASH_GRID = 8  # 8x8 cells -> 64-bit signature
AHASH_T = 7  # hamming threshold; < number of bands -> banding is EXACT


def ppm_ahash_sig(payload: bytes, kind: str) -> tuple[int, int]:
    """REAL dependency-free perceptual average-hash kernel: parse the
    binary-PPM payload (the ppm_image_features parser discipline),
    sum the RGB bytes of each cell of the 8x8 grid over the pixel
    matrix, and set bit j (row-major cell index) iff 64 * cell_sum >
    total_sum — ALL integer arithmetic (no grayscale division, no
    float mean), so the signature is bit-identical on any platform.
    Returns (sig_hi, sig_lo): the 64 bits split into two 32-bit
    halves held in non-negative ints (the Bloom 60-bit lesson — a
    bit-63 BIGINT signature would wrap negative and engines diverge
    on sign semantics)."""
    if kind != "image":
        raise ValueError("ahash is defined for image payloads")
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1
    w, h, _maxval = fields
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    px = raster.reshape(h, w, 3).astype(np.int64).sum(axis=2)  # per-pixel RGB sum
    ch, cw = h // AHASH_GRID, w // AHASH_GRID
    total = int(px.sum())
    sig = 0
    for r in range(AHASH_GRID):
        for c in range(AHASH_GRID):
            cell = int(px[r * ch : (r + 1) * ch, c * cw : (c + 1) * cw].sum())
            if AHASH_GRID * AHASH_GRID * cell > total:
                sig |= 1 << (r * AHASH_GRID + c)
    return (sig >> 32) & 0xFFFFFFFF, sig & 0xFFFFFFFF


def ppm_ahash_table(media: DataFrame) -> DataFrame:
    """(media_id, kind, payload, ...) -> (media_id, sig_hi, sig_lo)
    via the mapInPandas real-decode kernel."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = [
                ppm_ahash_sig(p, k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "sig_hi": [s[0] for s in sigs],
                    "sig_lo": [s[1] for s in sigs],
                }
            )

    return media.mapInPandas(
        run, schema="media_id long, sig_hi long, sig_lo long"
    )


def image_ahash_pairs(media: DataFrame, max_dist: int = AHASH_T) -> DataFrame:
    """-> (id_a, id_b, dist): image near-duplicate pairs by perceptual
    average-hash — id_a < id_b, dist = hamming distance between 64-bit
    aHash signatures, dist <= max_dist.  The image member of the dedup
    family (exact/Jaccard/MinHash/SimHash for text, cosine for
    embeddings, aHash for pixels).

    Candidate generation is a BANDED EQUI-JOIN on the signature's 8
    bytes (band k = bits 8k..8k+7): by pigeonhole, any pair within
    hamming distance <= 7 shares at least one full byte band, so the
    banding has recall EXACTLY 1 at the pinned threshold — the same
    argument as the SymSpell deletion join and the prefix-filtered
    Jaccard.  Pins restated in oracle._AHASH_PAIRS_SQL (change both
    sides or neither): the all-integer bit rule (64 * cell_sum >
    total, strict), row-major cell order, the (hi, lo) 32-bit split,
    max_dist = 7, pairs id_a < id_b.

    Scale shape (100 TB of images): decode+hash is embarrassingly
    parallel mapInPandas; candidates arrive through the 8-per-image
    band rows' equi-join (never an all-pairs signature scan); the
    exact distance check touches candidates only."""
    sigs = ppm_ahash_table(media)
    bands = sigs.select(
        "media_id",
        "sig_hi",
        "sig_lo",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"),
                        (
                            F.shiftright(
                                F.col("sig_lo" if k < 4 else "sig_hi"),
                                (k % 4) * 8,
                            ).bitwiseAND(F.lit(255))
                        ).alias("v"),
                    )
                    for k in range(8)
                ]
            )
        ).alias("b"),
    ).select(
        "media_id",
        "sig_hi",
        "sig_lo",
        F.col("b.k").alias("bk"),
        F.col("b.v").alias("bv"),
    )
    a = bands.select(
        F.col("media_id").alias("id_a"),
        F.col("sig_hi").alias("ha"),
        F.col("sig_lo").alias("la"),
        "bk",
        "bv",
    )
    b = bands.select(
        F.col("media_id").alias("id_b"),
        F.col("sig_hi").alias("hb"),
        F.col("sig_lo").alias("lb"),
        "bk",
        "bv",
    )
    dist = F.bit_count(
        F.col("ha").bitwiseXOR(F.col("hb"))
    ) + F.bit_count(F.col("la").bitwiseXOR(F.col("lb")))
    return (
        a.join(b, ["bk", "bv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist.cast("long").alias("dist"))
        .distinct()
        .where(F.col("dist") <= max_dist)
    )


def generate_ppm_media_with_mutants(
    spark: SparkSession, n: int, seed: int = 42
) -> DataFrame:
    """The aHash gate corpus: the n originals PLUS one mutant per
    original (media_id = 1000 + i) whose raster equals the original's
    except chunk 0 (bytes 0..15) comes from md5('ppm-mut-...') — a
    localized pixel edit, the near-duplicate regime aHash exists to
    catch.  Restated verbatim in oracle._AHASH_PAIRS_SQL's mutant
    branch (change both sides or neither)."""
    header = F.lit(f"P6\n{PPM_W} {PPM_H}\n255\n").cast("binary")
    reps = (PPM_W * PPM_H * 3) // 16

    def _chunk(r):
        return F.md5(F.concat_ws("-", F.lit("ppm"), F.col("id"), F.lit(seed), r))

    def _mchunk(r):
        return F.when(
            r == 0,
            F.md5(
                F.concat_ws(
                    "-", F.lit("ppm-mut"), F.col("id"), F.lit(seed), r
                )
            ),
        ).otherwise(_chunk(r))

    seqs = F.sequence(F.lit(0), F.lit(reps - 1))
    orig = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.concat(
            header, F.unhex(F.array_join(F.transform(seqs, _chunk), ""))
        ).alias("payload"),
        F.create_map(F.lit("seed"), F.lit(str(seed))).alias("meta"),
    )
    mut = spark.range(n).select(
        (F.col("id") + F.lit(1000)).alias("media_id"),
        F.lit("image").alias("kind"),
        F.concat(
            header, F.unhex(F.array_join(F.transform(seqs, _mchunk), ""))
        ).alias("payload"),
        F.create_map(F.lit("seed"), F.lit(str(seed))).alias("meta"),
    )
    return orig.unionByName(mut)


AFP_FRAME = 16  # samples per energy frame -> 32 frames, 31 delta bits
AFP_T = 3  # hamming threshold; < number of bands (4) -> banding EXACT


def wav_fingerprint_sig(payload: bytes, kind: str) -> int:
    """REAL dependency-free audio fingerprint kernel (the
    chromaprint idea in its integer skeleton): parse the RIFF/WAVE
    payload (the wav_audio_features parser discipline), sum |sample|
    over 16-sample frames (exact integer energies), and set bit i iff
    energy[i+1] > energy[i] STRICT — the energy-delta sign sequence,
    robust to global gain changes by construction.  31 bits -> always
    a positive BIGINT (no split needed)."""
    if kind != "audio":
        raise ValueError("fingerprint is defined for audio payloads")
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i = 12
    data = None
    fmt_ok = False
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, _, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1 or bits != 16 or channels != 1:
                raise ValueError("need mono 16-bit PCM")
            fmt_ok = True
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # odd-size chunks carry a pad byte
    if not fmt_ok or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
    n_frames = samples.size // AFP_FRAME
    e = np.abs(samples[: n_frames * AFP_FRAME]).reshape(
        n_frames, AFP_FRAME
    ).sum(axis=1)
    sig = 0
    for i in range(n_frames - 1):
        if int(e[i + 1]) > int(e[i]):
            sig |= 1 << i
    return sig


def generate_wav_media_with_mutants(
    spark: SparkSession, n: int, seed: int = 42
) -> DataFrame:
    """The fingerprint gate corpus: the n originals PLUS one mutant
    per original (media_id = 1000 + i) whose PCM equals the
    original's except chunk 0 (samples 0..7) comes from
    md5('wav-mut-...') — a localized edit touching only the first
    frame's energy.  Restated verbatim in oracle._AUDIO_FP_SQL."""
    header = F.lit(_wav_header(_WAV_DATA_BYTES))
    reps = _WAV_DATA_BYTES // 16

    def _chunk(r):
        return F.md5(F.concat_ws("-", F.lit("wav"), F.col("id"), F.lit(seed), r))

    def _mchunk(r):
        return F.when(
            r == 0,
            F.md5(
                F.concat_ws("-", F.lit("wav-mut"), F.col("id"), F.lit(seed), r)
            ),
        ).otherwise(_chunk(r))

    seqs = F.sequence(F.lit(0), F.lit(reps - 1))
    meta = F.create_map(F.lit("seed"), F.lit(str(seed)))
    orig = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.concat(
            header, F.unhex(F.array_join(F.transform(seqs, _chunk), ""))
        ).alias("payload"),
        meta.alias("meta"),
    )
    mut = spark.range(n).select(
        (F.col("id") + F.lit(1000)).alias("media_id"),
        F.lit("audio").alias("kind"),
        F.concat(
            header, F.unhex(F.array_join(F.transform(seqs, _mchunk), ""))
        ).alias("payload"),
        meta.alias("meta"),
    )
    return orig.unionByName(mut)


def audio_fingerprint_pairs(media: DataFrame, max_dist: int = AFP_T) -> DataFrame:
    """-> (id_a, id_b, dist): audio near-duplicate pairs by the
    energy-delta fingerprint — the audio member of the dedup family
    beside image_ahash_pairs.  Candidates via a 4-byte-band equi-join
    (band k = bits 8k..8k+7): pigeonhole makes recall EXACTLY 1 at
    hamming <= 3.  Pins restated in oracle._AUDIO_FP_SQL (change both
    sides or neither): 16-sample integer |.|-energy frames, strict >
    delta bits, 31-bit signature, max_dist = 3, pairs id_a < id_b."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = [
                wav_fingerprint_sig(p, k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "sig": sigs,
                }
            )

    sigs = media.mapInPandas(run, schema="media_id long, sig long")
    bands = sigs.select(
        "media_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"),
                        (
                            F.shiftright(F.col("sig"), k * 8).bitwiseAND(
                                F.lit(255)
                            )
                        ).alias("v"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("b"),
    ).select(
        "media_id",
        "sig",
        F.col("b.k").alias("bk"),
        F.col("b.v").alias("bv"),
    )
    a = bands.select(
        F.col("media_id").alias("id_a"), F.col("sig").alias("sa"), "bk", "bv"
    )
    b = bands.select(
        F.col("media_id").alias("id_b"), F.col("sig").alias("sb"), "bk", "bv"
    )
    dist = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        a.join(b, ["bk", "bv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist.cast("long").alias("dist"))
        .distinct()
        .where(F.col("dist") <= max_dist)
    )


VFP_T = 5  # total hamming over frames; < Y4M_FRAMES -> pigeonhole EXACT


def y4m_frame_sigs(payload: bytes, kind: str) -> list[tuple[int, int, int]]:
    """REAL video fingerprint kernel: parse the YUV4MPEG2 stream (the
    y4m_frame_stats parser — _parse_y4m), and per frame compute the
    Y-plane average hash over the 64 pixels (bit p set iff 64 *
    Y[p] > plane_sum, STRICT, row-major p) — all integer.  Returns
    [(frame, sig_hi, sig_lo), ...] with the 64 bits split into 32-bit
    halves (the aHash discipline)."""
    if kind != "video":
        raise ValueError("frame sigs are defined for video payloads")
    w, h, _cs, frames = _parse_y4m(payload)
    out = []
    for fidx, (y, _u, _v) in enumerate(frames):
        yv = y.astype(np.int64).ravel()
        total = int(yv.sum())
        n = yv.size
        sig = 0
        for p in range(n):
            if n * int(yv[p]) > total:
                sig |= 1 << p
        out.append((fidx, (sig >> 32) & 0xFFFFFFFF, sig & 0xFFFFFFFF))
    return out


def generate_y4m_media_with_mutants(
    spark: SparkSession, n: int, seed: int = 42
) -> DataFrame:
    """The video-fingerprint gate corpus: the n originals PLUS one
    mutant per original (media_id = 1000 + i) whose byte stream
    equals the original's except frame 0's FIRST BYTE (Y pixel (0,0))
    is zeroed — the mutant chunk-0 hex string starts '00'.  Restated
    verbatim in oracle._VIDEO_FP_SQL."""
    header = F.lit(
        f"YUV4MPEG2 W{Y4M_W} H{Y4M_H} F25:1 Ip A1:1 C444\n"
    ).cast("binary")
    marker = F.lit(b"FRAME\n")
    chunks_per_frame = _Y4M_FRAME_BYTES // 16

    def _body(mutant: bool):
        def _frame(fidx):
            def _chunk(c):
                hx = F.md5(
                    F.concat_ws(
                        "-", F.lit("y4m"), F.col("id"), F.lit(seed),
                        fidx * chunks_per_frame + c,
                    )
                )
                if mutant:
                    return F.when(
                        (fidx == 0) & (c == F.lit(0)),
                        F.concat(F.lit("00"), F.substring(hx, 3, 30)),
                    ).otherwise(hx)
                return hx

            return F.concat(
                marker,
                F.unhex(
                    F.array_join(
                        F.transform(
                            F.sequence(F.lit(0), F.lit(chunks_per_frame - 1)),
                            _chunk,
                        ),
                        "",
                    )
                ),
            )

        return F.concat(*[_frame(F.lit(i)) for i in range(Y4M_FRAMES)])

    meta = F.create_map(F.lit("seed"), F.lit(str(seed)))
    orig = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.concat(header, _body(False)).alias("payload"),
        meta.alias("meta"),
    )
    mut = spark.range(n).select(
        (F.col("id") + F.lit(1000)).alias("media_id"),
        F.lit("video").alias("kind"),
        F.concat(header, _body(True)).alias("payload"),
        meta.alias("meta"),
    )
    return orig.unionByName(mut)


def video_fingerprint_pairs(media: DataFrame, max_dist: int = VFP_T) -> DataFrame:
    """-> (id_a, id_b, dist): video near-duplicate pairs by per-frame
    Y-plane average hashes — the video member of the dedup family
    beside image_ahash_pairs and audio_fingerprint_pairs.  dist =
    TOTAL hamming distance across the aligned frame signatures.

    Candidate generation joins on an IDENTICAL FRAME signature
    (frame_idx, sig_hi, sig_lo): by pigeonhole, total dist <= 5 over
    6 frames forces at least one frame pair at distance 0, so the
    equi-join has recall EXACTLY 1 at the pinned threshold.  Pins
    restated in oracle._VIDEO_FP_SQL (change both sides or neither):
    the strict 64*Y > plane_sum bit rule, row-major pixels, (hi, lo)
    split, max_dist = 5, pairs id_a < id_b.

    Scale shape: decode+hash is mapInPandas; candidates through the
    per-frame signature equi-join (never an all-pairs scan); the
    exact total distance touches candidates only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p, k in zip(
                pdf["media_id"], pdf["payload"], pdf["kind"]
            ):
                for fidx, hi, lo in y4m_frame_sigs(p, k):
                    rows.append((int(mid), fidx, hi, lo))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame", "sig_hi", "sig_lo"]
            )

    sigs = media.mapInPandas(
        run, schema="media_id long, frame int, sig_hi long, sig_lo long"
    ).persist()
    a = sigs.select(
        F.col("media_id").alias("id_a"),
        "frame",
        F.col("sig_hi").alias("ha"),
        F.col("sig_lo").alias("la"),
    )
    b = sigs.select(
        F.col("media_id").alias("id_b"),
        "frame",
        F.col("sig_hi").alias("hb"),
        F.col("sig_lo").alias("lb"),
    )
    cand = (
        a.join(b, ["frame"])
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("ha") == F.col("hb"))
            & (F.col("la") == F.col("lb"))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    av = sigs.select(
        F.col("media_id").alias("id_a"),
        "frame",
        F.col("sig_hi").alias("ha"),
        F.col("sig_lo").alias("la"),
    )
    bv = sigs.select(
        F.col("media_id").alias("id_b"),
        "frame",
        F.col("sig_hi").alias("hb"),
        F.col("sig_lo").alias("lb"),
    )
    dist = (
        cand.join(av, "id_a")
        .join(bv, ["id_b", "frame"])
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(
                F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
                + F.bit_count(F.col("la").bitwiseXOR(F.col("lb")))
            ).cast("long").alias("dist")
        )
    )
    return dist.where(F.col("dist") <= max_dist)


Y4M_SCENE_SAD = 2_000  # scene-cut threshold on the 64-pixel Y-plane SAD
Y4M_SCENE_SCHEMA = "media_id long, frame_idx int, sad long, is_cut boolean"


def y4m_scene_cuts(
    media: DataFrame, threshold: int = Y4M_SCENE_SAD
) -> DataFrame:
    """REAL video decode -> shot-boundary detection: per consecutive
    frame pair, the EXACT integer sum of absolute Y-plane differences
    (SAD — the classic scene-cut feature); a cut fires where SAD
    STRICTLY exceeds the pinned threshold.  frame_idx = the LATER
    frame's index (1..F-1).

    Pins (restated in oracle._Y4M_SCENE_SQL — change both sides or
    neither): Y plane only, SAD = sum |Y_f[p] - Y_{f-1}[p]| over the
    64 pixels as exact int64, threshold 2000 STRICT >.  On the
    md5-noise synthetic corpus every pair is a cut (E[SAD] ~ 5400);
    the informative gate signal is the exact SAD value itself.

    Scale shape: one mapInPandas decode pass, rows/media = F-1 — the
    plumbing (schema, batching, binary column) is identical to
    y4m_frame_stats."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sads, cuts = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _, _, _, frames = _parse_y4m(bytes(payload))
                for i in range(1, len(frames)):
                    y_prev = frames[i - 1][0].astype(np.int64)
                    y_cur = frames[i][0].astype(np.int64)
                    sad = int(np.abs(y_cur - y_prev).sum())
                    ids.append(mid)
                    idxs.append(i)
                    sads.append(sad)
                    cuts.append(sad > threshold)
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "sad": pd.Series(sads, dtype="int64"),
                 "is_cut": pd.Series(cuts, dtype="bool")}
            )

    return media.where(F.col("kind") == "video").mapInPandas(
        run, Y4M_SCENE_SCHEMA
    )


WAV_ACTIVE_ENERGY = 250_000  # 16-sample |.|-energy activity threshold
WAV_SEG_SCHEMA = (
    "media_id long, seg_idx long, start_frame long, end_frame long,"
    " n_frames long, energy_sum long"
)


def wav_energy_segments(
    media: DataFrame, threshold: int = WAV_ACTIVE_ENERGY
) -> DataFrame:
    """REAL audio decode -> voice-activity-style segmentation: frames
    whose 16-sample integer |.|-energy (the wav_fingerprint_sig frame
    law) STRICTLY exceeds the threshold are ACTIVE; maximal runs of
    consecutive active frames are segments.

    Pins (restated in oracle._WAV_SEGMENTS_SQL — change both sides or
    neither): energy frames identical to the fingerprint gate's,
    active iff e > 250000 STRICT, segments = consecutive-frame runs,
    seg_idx 1-based by start_frame, energy_sum = exact BIGINT sum over
    the segment's frames; all-inactive clips emit nothing.

    Scale shape: one mapInPandas decode pass, bounded per-clip state —
    the y4m_scene_cuts plumbing on the audio column."""
    import struct

    def _energies(payload: bytes) -> list[int]:
        # same RIFF walk as wav_fingerprint_sig (change both or neither)
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE payload")
        i = 12
        data = None
        while i + 8 <= len(payload):
            cid = payload[i : i + 4]
            size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
            body = payload[i + 8 : i + 8 + size]
            if cid == b"data":
                data = body
            i += 8 + size + (size & 1)
        if data is None:
            raise ValueError("no data chunk")
        samples = np.frombuffer(
            data[: (len(data) // 2) * 2], dtype="<i2"
        ).astype(np.int64)
        n_frames = len(samples) // 16
        framed = np.abs(samples[: n_frames * 16]).reshape(n_frames, 16)
        return framed.sum(axis=1).tolist()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, segs, starts, ends, ns, esums = [], [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                es = _energies(bytes(payload))
                seg_idx = 0
                i = 0
                while i < len(es):
                    if es[i] > threshold:
                        j = i
                        while j + 1 < len(es) and es[j + 1] > threshold:
                            j += 1
                        seg_idx += 1
                        mids.append(mid)
                        segs.append(seg_idx)
                        starts.append(i)
                        ends.append(j)
                        ns.append(j - i + 1)
                        esums.append(int(sum(es[i : j + 1])))
                        i = j + 1
                    else:
                        i += 1
            yield pd.DataFrame(
                {"media_id": pd.Series(mids, dtype="int64"),
                 "seg_idx": pd.Series(segs, dtype="int64"),
                 "start_frame": pd.Series(starts, dtype="int64"),
                 "end_frame": pd.Series(ends, dtype="int64"),
                 "n_frames": pd.Series(ns, dtype="int64"),
                 "energy_sum": pd.Series(esums, dtype="int64")}
            )

    return media.where(F.col("kind") == "audio").mapInPandas(
        run, WAV_SEG_SCHEMA
    )


PPM_HIST_BUCKETS = 8  # byte DIV 32
PPM_HIST_SCHEMA = "media_id long, channel int, bucket int, n long"


def ppm_color_histogram(media: DataFrame) -> DataFrame:
    """REAL image decode -> per-channel color histogram: exact pixel
    counts per (channel, intensity DIV 32 bucket) — the color-profile
    analytics member of the image family beside the strip features and
    the perceptual hash.

    Pins (restated in oracle._PPM_HIST_SQL — change both sides or
    neither): channels in raster order (0=R, 1=G, 2=B — byte pos % 3),
    bucket = byte value integer-DIV 32 (8 buckets), empty buckets
    absent; the raster parse is the real P6 walker
    (ppm_image_features' header discipline)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, chans, bks, ns = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                if payload[:2] != b"P6":
                    raise ValueError("not a binary PPM (P6) payload")
                fields: list[int] = []
                i = 2
                while len(fields) < 3:
                    while i < len(payload) and payload[i : i + 1].isspace():
                        i += 1
                    if payload[i : i + 1] == b"#":
                        while i < len(payload) and payload[i : i + 1] != b"\n":
                            i += 1
                        continue
                    j = i
                    while j < len(payload) and not payload[j : j + 1].isspace():
                        j += 1
                    fields.append(int(payload[i:j]))
                    i = j
                i += 1
                w, h, _maxval = fields
                raster = np.frombuffer(
                    payload, dtype=np.uint8, count=w * h * 3, offset=i
                )
                px = raster.reshape(-1, 3)
                for ch in range(3):
                    counts = np.bincount(
                        px[:, ch] >> 5, minlength=PPM_HIST_BUCKETS
                    )
                    for bk in range(PPM_HIST_BUCKETS):
                        if counts[bk]:
                            mids.append(mid)
                            chans.append(ch)
                            bks.append(bk)
                            ns.append(int(counts[bk]))
            yield pd.DataFrame(
                {"media_id": pd.Series(mids, dtype="int64"),
                 "channel": pd.Series(chans, dtype="int32"),
                 "bucket": pd.Series(bks, dtype="int32"),
                 "n": pd.Series(ns, dtype="int64")}
            )

    return media.where(F.col("kind") == "image").mapInPandas(
        run, PPM_HIST_SCHEMA
    )
