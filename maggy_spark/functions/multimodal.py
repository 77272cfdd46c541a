"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Arrow-batched decode/feature-extract plumbing.

The container ships no image/audio codecs, so the decode step is a
deterministic fake (documented stub) — but everything Spark-side is
real and tested: BinaryType columns, metadata structs, mapInPandas
batch iteration, schema contracts, and partition sizing. Swapping
the stub for PIL/librosa/ffmpeg is a one-function change on the
executor, no plan changes.

Scale notes: binary payloads never pass through a groupBy — all
transforms are mapInPandas (narrow, no shuffle); metadata-only
queries select around the binary column so parquet column pruning
keeps payload IO out of them entirely.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from maggy_spark.plans.fixtures import load_table

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("meta", T.StructType([
            T.StructField("n_bytes", T.LongType()),
            T.StructField("format", T.StringType()),
            T.StructField("source", T.StringType()),
        ])),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table from `documents`: text bytes as the
    opaque payload (binary), typed metadata alongside — the storage
    layout (binary + struct metadata) is the real design."""
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("media_type"),
        F.struct(
            F.length(payload).cast("bigint").alias("n_bytes"),
            F.lit("raw/v1").alias("format"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


DECODE_SCHEMA = (
    "media_id bigint, media_type string, n_bytes bigint, "
    "width int, height int, n_frames int, duration_sec double, checksum string"
)


def _fake_decode(payload: bytes, media_type: str) -> dict:
    """STUB: deterministic fake decoder.

    A real deployment replaces this with PIL.Image.open /
    soundfile.read / av.open — none of which exist in this
    container. The fake derives plausible, deterministic metadata
    from the payload bytes so the pipeline around it is fully
    testable. Raising NotImplementedError here would be the other
    documented option; the fake keeps the e2e path drivable.
    """
    import hashlib

    n = len(payload)
    h = hashlib.md5(payload).hexdigest()
    seed = int(h[:8], 16)
    if media_type == "image":
        return {"width": 64 + seed % 512, "height": 64 + (seed >> 9) % 512, "n_frames": 1,
                "duration_sec": 0.0, "checksum": h}
    if media_type == "audio":
        return {"width": 0, "height": 0, "n_frames": n,
                "duration_sec": n / 16_000.0, "checksum": h}
    return {"width": 320, "height": 240, "n_frames": 1 + seed % 300,
            "duration_sec": (1 + seed % 300) / 30.0, "checksum": h}


def _media_decoders() -> dict:
    """REAL decoders by media type, import-guarded like
    frameworks.py gates torch/tf: PIL for images, soundfile for
    audio — whichever is installed on the executor. Empty dict when
    neither is (this container). Resolved lazily inside the
    mapInPandas stage, so the guard runs on the WORKER's environment,
    not the driver's."""
    decs: dict = {}
    try:
        from PIL import Image  # noqa: F401

        def _img(payload: bytes) -> dict:
            import hashlib
            import io

            from PIL import Image as _I

            with _I.open(io.BytesIO(payload)) as im:
                return {
                    "width": int(im.width),
                    "height": int(im.height),
                    "n_frames": int(getattr(im, "n_frames", 1)),
                    "duration_sec": 0.0,
                    "checksum": hashlib.md5(payload).hexdigest(),
                }

        decs["image"] = _img
    except ImportError:
        pass
    try:
        import soundfile  # noqa: F401

        def _aud(payload: bytes) -> dict:
            import hashlib
            import io

            import soundfile as _sf

            data, rate = _sf.read(io.BytesIO(payload))
            return {
                "width": 0,
                "height": 0,
                "n_frames": int(len(data)),
                "duration_sec": float(len(data)) / float(rate),
                "checksum": hashlib.md5(payload).hexdigest(),
            }

        decs["audio"] = _aud
    except ImportError:
        pass
    return decs


def _decode(payload: bytes, media_type: str, decoders: dict | None = None) -> dict:
    """Decode one payload: the REAL decoder when its library is
    present and the bytes actually parse, else the deterministic
    stub. The synthetic corpus's payloads are utf-8 text, so they
    never parse as real media and the gate oracle (which replicates
    the stub) stays deterministic whether or not PIL/soundfile are
    installed."""
    dec = (decoders or {}).get(media_type)
    if dec is not None:
        try:
            return dec(payload)
        except Exception:  # noqa: BLE001 - undecodable bytes -> stub
            pass
    return _fake_decode(payload, media_type)


def mm1_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode pass over media payloads via mapInPandas: Arrow batches
    in, metadata rows out; binary stays executor-local (narrow op,
    zero shuffle). Decode itself is the documented stub."""
    media = media_table(spark, sf_dir)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoders = _media_decoders()  # worker-side import guard
        for pdf in batches:
            out = []
            # zip over column arrays, not iterrows: decode is per-item
            # Python either way, but iterrows materializes a Series per
            # row (~several x slower than tuple iteration)
            for media_id, payload, media_type in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                payload = bytes(payload)
                d = _decode(payload, media_type, decoders)
                out.append({"media_id": media_id, "media_type": media_type,
                            "n_bytes": len(payload), **d})
            yield pd.DataFrame(out)

    return media.mapInPandas(decode_batches, DECODE_SCHEMA)


def mm2_frame_sample(spark: SparkSession, sf_dir: str, every_n: int = 30) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled
    frame index (0, n, 2n, ... plus the last frame) — the A10
    interim-selection pattern applied to frames."""
    decoded = mm1_decode_metadata(spark, sf_dir).where(F.col("media_type") == "video")
    idx = F.explode(
        F.array_distinct(
            F.concat(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n)),
                F.array(F.col("n_frames") - 1),
            )
        )
    )
    return decoded.select("media_id", "n_frames", idx.alias("frame_idx"))


def mm3_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregation: bytes and duration per media type.
    Selects only meta fields -> parquet column pruning keeps the
    binary payload out of the scan entirely."""
    media = media_table(spark, sf_dir)
    return media.groupBy("media_type").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
        F.min(F.col("meta.n_bytes")).alias("min_bytes"),
        F.max(F.col("meta.n_bytes")).alias("max_bytes"),
    )


MM3_SQL = """
SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       count(*) AS n_items,
       -- octet_length of the utf-8 encoding: the Spark side measures
       -- BYTES of the binary payload, and char length would silently
       -- diverge on any non-ASCII text
       cast(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       cast(min(octet_length(encode(text))) AS BIGINT) AS min_bytes,
       cast(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
FROM documents
GROUP BY 1
"""


# The stub decoder is a PURE function of (md5(payload), len(payload),
# media_type), so its output is SQL-expressible: DuckDB's md5(VARCHAR)
# hashes the string's UTF-8 bytes — exactly the payload bytes Spark
# hashes — and '0x'-prefixed hex casts recover seed = int(h[:8], 16).
# Float fields are single IEEE divisions of exact integers on both
# sides, so they compare bit-exact.
MM1_SQL = """
WITH m AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         cast(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         md5(text) AS h
  FROM documents
), s AS (
  SELECT *, CAST('0x' || substr(h, 1, 8) AS UBIGINT) AS seed FROM m
)
SELECT media_id, media_type, n_bytes,
       CAST(CASE media_type WHEN 'image' THEN 64 + seed % 512
                            WHEN 'audio' THEN 0 ELSE 320 END AS INTEGER) AS width,
       CAST(CASE media_type WHEN 'image' THEN 64 + (seed // 512) % 512
                            WHEN 'audio' THEN 0 ELSE 240 END AS INTEGER) AS height,
       CAST(CASE media_type WHEN 'image' THEN 1
                            WHEN 'audio' THEN n_bytes
                            ELSE 1 + seed % 300 END AS INTEGER) AS n_frames,
       CAST(CASE media_type WHEN 'image' THEN 0.0
                            WHEN 'audio' THEN n_bytes / 16000.0
                            ELSE (1 + seed % 300) / 30.0 END AS DOUBLE) AS duration_sec,
       h AS checksum
FROM s
"""


MM2_SQL = """
WITH v AS (
  SELECT doc_id AS media_id,
         CAST(1 + CAST('0x' || substr(md5(text), 1, 8) AS UBIGINT) % 300 AS INTEGER) AS n_frames
  FROM documents
  WHERE doc_id % 3 = 2
)
SELECT media_id, n_frames, CAST(f AS INTEGER) AS frame_idx
FROM (
  SELECT media_id, n_frames,
         unnest(list_distinct(list_append(range(0, CAST(n_frames AS BIGINT), 30),
                                          CAST(n_frames AS BIGINT) - 1))) AS f
  FROM v
)
"""


THUMB_BOX = 224  # resize target: longest side after thumbnailing

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("new_width", T.IntegerType()),
        T.StructField("new_height", T.IntegerType()),
        T.StructField("thumb", T.BinaryType()),
    ]
)


def mm4_resize_thumbnails(spark: SparkSession, sf_dir: str, box: int = THUMB_BOX) -> DataFrame:
    """Resize pass for image rows: binary IN -> binary OUT through
    mapInPandas — the Arrow round-trip a real thumbnailer (PIL
    `Image.thumbnail`) rides; the pixel work is the documented stub
    (aspect-preserving integer geometry + a deterministic byte slice
    standing in for re-encoding). The op is narrow (no shuffle) and
    the binary column never enters an exchange; geometry math is
    integer-exact so the test's SQL twin reproduces it bit-for-bit.
    Not oracle-registered: the output carries a BINARY column, which
    the value-hash compare does not canonicalize — invariants and the
    geometry twin are pinned by test_mm4_resize_plumbing instead.
    """
    # decode happens INSIDE the resize stage (a real thumbnailer reads
    # dimensions from the payload it is already holding) — joining the
    # mm1 relation here would decode the corpus a second time and, at
    # scale, drag the binary payload through a shuffle
    src = media_table(spark, sf_dir).where(F.col("media_type") == "image").select(
        "media_id", "payload"
    )

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoders = _media_decoders()  # worker-side import guard (PIL)
        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                d = _decode(payload, "image", decoders)
                w, h = d["width"], d["height"]
                s = max(w, h)
                nw, nh = (w * box) // s, (h * box) // s
                # stub re-encode: the thumbnail is a prefix slice the
                # size the geometry implies (capped by the source)
                thumb = payload[: min(len(payload), nw * nh)]
                out.append(
                    {"media_id": media_id, "width": int(w), "height": int(h),
                     "new_width": int(nw), "new_height": int(nh), "thumb": thumb}
                )
            yield pd.DataFrame(out)

    return src.mapInPandas(resize_batches, RESIZE_SCHEMA)


N_FEATURE_BUCKETS = 16


def mm5_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extract pass: per-media byte histogram in LONG format
    (media_id, bucket, frac) — the vector-producing mapInPandas shape
    a real extractor (CLIP embedding, mel spectrogram) plugs into,
    emitted one row per bucket so every value is scalar and the
    DuckDB oracle can hash it. The Python stage computes real numpy
    bincounts over the payload bytes; fractions are single IEEE
    divisions of exact integers, so they compare bit-exact with the
    oracle's per-byte SQL."""
    import numpy as np

    media = media_table(spark, sf_dir)
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("bucket", T.IntegerType()),
            T.StructField("frac", T.DoubleType()),
        ]
    )

    def histogram_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                counts = np.bincount(
                    np.frombuffer(payload, dtype=np.uint8) >> 4, minlength=N_FEATURE_BUCKETS
                )
                n = len(payload)
                if n == 0:
                    # empty payload: no histogram rows, matching the
                    # oracle's length(s) > 0 filter (0/0 has no answer)
                    continue
                for b in range(N_FEATURE_BUCKETS):
                    out.append(
                        {"media_id": media_id, "bucket": b, "frac": float(counts[b]) / n}
                    )
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(histogram_batches, schema)


# The corpus is ASCII (asserted below via octet_length == length in the
# same query), so per-char ord() == per-byte value and DuckDB can
# replay the byte histogram; a non-ASCII corpus would need a BLOB-side
# histogram instead.
MM5_SQL = f"""
WITH m AS (
    SELECT doc_id AS media_id, text AS s FROM documents
    WHERE octet_length(encode(text)) = length(text) AND length(text) > 0
)
SELECT media_id, CAST(k AS INTEGER) AS bucket,
       CAST(len(list_filter(generate_series(1, length(s)), i -> ord(substr(s, i, 1)) // 16 = k)) AS DOUBLE)
           / length(s) AS frac
FROM m CROSS JOIN generate_series(0, {N_FEATURE_BUCKETS - 1}) gs(k)
"""


# -- MM6: perceptual-hash near-dup over media payloads ------------------

PHASH_BITS = 60      # 15 hex chars -> fits a signed 64-bit int, like dd6
PHASH_BANDS = 4      # pigeonhole: exact recall for hamming <= PHASH_BANDS-1
PHASH_BAND_BITS = PHASH_BITS // PHASH_BANDS
PHASH_MAX_HAMMING = PHASH_BANDS - 1


PHASH_SIDE = 32  # thumbnail side the DCT runs over (classic pHash geometry)


def _dct_matrix(n: int):
    """Orthonormal DCT-II basis matrix (type-II with the standard
    ortho scaling), so C = D @ g @ D.T is the 2-D DCT of g. Pure
    numpy — no scipy in this container."""
    import numpy as np

    k = np.arange(n, dtype=np.float64)
    d = np.cos(np.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / (2.0 * n))
    d *= np.sqrt(2.0 / n)
    d[0, :] *= np.sqrt(0.5)
    return d


def dct_phash_bits(gray) -> int:
    """60-bit DCT sign hash of a square grayscale array: 2-D DCT,
    top-left 8x8 block in row-major order minus the DC coefficient,
    first PHASH_BITS AC coefficients, bit = sign(coef) packed MSB
    first. Dropping DC makes the hash invariant to global brightness
    shifts; signs (not median-threshold) keep it a pure per-pixel
    function so two independently-decoded copies agree bit-for-bit.
    PIL-free on purpose: the DCT core is testable without codecs."""
    import numpy as np

    g = np.asarray(gray, dtype=np.float64)
    if g.ndim != 2 or g.shape[0] != g.shape[1]:
        raise ValueError(f"dct_phash_bits wants a square 2-D array, got {g.shape}")
    d = _dct_matrix(g.shape[0])
    block = (d @ g @ d.T)[:8, :8].ravel()[1 : PHASH_BITS + 1]
    bits = 0
    for c in block:
        bits = (bits << 1) | (1 if c > 0 else 0)
    return bits


def decode_ppm_gray(payload: bytes):
    """STRICT binary-PPM (P6, maxval <= 255) parser into a float64
    grayscale array (ITU-R 601 luma weights) — the codec-free decode
    path that lets decode -> DCT -> band run in environments without
    PIL (this container). Pure stdlib + numpy.

    Returns None unless the bytes are a WELL-FORMED P6 container:
    the magic, exactly three decimal header fields (with optional
    `#` comment lines), a single whitespace separator, and a raster
    of exactly width*height*3 bytes. The strictness is load-bearing:
    it makes an accidental decode of a synthetic text payload
    practically impossible, which is what keeps mm6's md5-stub
    oracle deterministic (pinned by the sf0.01 environment test)."""
    import re

    import numpy as np

    if not payload.startswith(b"P6"):
        return None
    m = re.match(
        rb"P6(?:[ \t\r\n]+(?:#[^\n]*\n[ \t\r\n]*)*)(\d+)"
        rb"(?:[ \t\r\n]+(?:#[^\n]*\n[ \t\r\n]*)*)(\d+)"
        rb"(?:[ \t\r\n]+(?:#[^\n]*\n[ \t\r\n]*)*)(\d+)"
        rb"[ \t\r\n]",
        payload,
    )
    if m is None:
        return None
    w, h, maxval = (int(g) for g in m.groups())
    if not (0 < maxval <= 255) or w < PHASH_SIDE or h < PHASH_SIDE:
        return None
    raster = payload[m.end():]
    if len(raster) != w * h * 3:
        return None
    rgb = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3).astype(np.float64)
    gray = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]) * (
        255.0 / maxval
    )
    return gray


def area_resize(gray, side: int):
    """Deterministic area-average downsample of a 2-D array to
    side x side: integer bucket edges i*n//side, each output pixel
    the mean of its source block. No interpolation kernels, so two
    independent decodes of the same raster agree bit-for-bit."""
    import numpy as np

    g = np.asarray(gray, dtype=np.float64)
    h, w = g.shape
    ye = [y * h // side for y in range(side + 1)]
    xe = [x * w // side for x in range(side + 1)]
    out = np.empty((side, side), dtype=np.float64)
    for i in range(side):
        for j in range(side):
            out[i, j] = g[ye[i]:ye[i + 1], xe[j]:xe[j + 1]].mean()
    return out


def _phash_decoder():
    """REAL perceptual hash: decode -> grayscale PHASH_SIDE x
    PHASH_SIDE thumbnail -> dct_phash_bits. Two decode paths, tried
    in order per payload: the strict stdlib PPM parser (always
    available), then PIL (import-guarded — absent in this
    container). Raises on bytes neither path accepts, which the
    signing stage catches into the md5 stub. Resolved lazily inside
    the mapInPandas stage so the PIL guard runs on the WORKER's
    environment."""
    try:
        from PIL import Image as _I
    except ImportError:
        _I = None

    def _ph(payload: bytes) -> int:
        g = decode_ppm_gray(payload)
        if g is not None:
            return dct_phash_bits(area_resize(g, PHASH_SIDE))
        if _I is None:
            raise ValueError("payload is not a strict P6 PPM and no codec is installed")
        import io

        import numpy as np

        resample = getattr(getattr(_I, "Resampling", _I), "LANCZOS")
        with _I.open(io.BytesIO(payload)) as im:
            g = np.asarray(
                im.convert("L").resize((PHASH_SIDE, PHASH_SIDE), resample), dtype=np.float64
            )
        return dct_phash_bits(g)

    return _ph


def _phash_stub(payload: bytes) -> int:
    """STUB signature: top 60 bits of md5(payload) — the documented
    fallback when no codec is installed or the bytes don't parse as
    an image. Must stay the exact value MM6_SQL derives."""
    import hashlib

    return int(hashlib.md5(payload).hexdigest()[:15], 16)


PHASH_SIG_SCHEMA = "media_id bigint, sigint bigint"


def _phash_signatures(img: DataFrame) -> DataFrame:
    """(media_id, sigint) over image rows via mapInPandas: real DCT
    pHash when PIL is present AND the payload decodes, else the md5
    stub — per payload, so a corpus mixing real images with
    undecodable bytes still signs every row deterministically. The
    binary payload stays executor-local (narrow stage, no shuffle);
    only the 8-byte signature continues into the banded join."""

    def sign_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        real = _phash_decoder()  # worker-side import guard
        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                sig = None
                if real is not None:
                    try:
                        sig = real(payload)
                    except Exception:  # noqa: BLE001 - undecodable -> stub
                        sig = None
                if sig is None:
                    sig = _phash_stub(payload)
                out.append({"media_id": media_id, "sigint": sig})
            # explicit columns: a zero-row Arrow batch would otherwise
            # yield a column-less frame that fails schema conversion
            yield pd.DataFrame(out, columns=["media_id", "sigint"])

    return img.select("media_id", "payload").mapInPandas(sign_batches, PHASH_SIG_SCHEMA)


def mm6_phash_near_dup(spark: SparkSession, sf_dir: str, max_hamming: int = PHASH_MAX_HAMMING) -> DataFrame:
    """Perceptual-hash near-duplicate pairs over IMAGE payloads — the
    multimodal twin of the dd6/dd7 SimHash pipeline: a 60-bit pHash
    per payload, pigeonhole-banded candidate join (4 bands of 15 bits
    — lossless for hamming <= 3), exact hamming verification. This is
    how an image-heavy training corpus dedups re-encoded copies
    without ever comparing pixels pairwise.

    The hash is the REAL DCT pHash when the payload decodes — via
    the always-available strict PPM parser (decode_ppm_gray, round 8)
    or PIL when installed on the executors (decode -> 32x32 grayscale
    -> 2-D DCT -> sign bits of the first 60 AC coefficients of the
    top-left 8x8 block; see dct_phash_bits), falling back per payload
    to the documented md5 stub when nothing decodes the bytes — which
    is what keeps the oracle deterministic on this container's
    synthetic utf-8 payloads (environment-pinned by
    test_mm6_oracle_environment_still_stub_only at the gate's own
    sf0.01). Banding, the skew-free candidate join, first-match
    de-dup of multi-band pairs, and the hamming filter reuse dd7's
    machinery unchanged.
    """
    img = media_table(spark, sf_dir).where(F.col("media_type") == "image")
    return phash_near_dup_over(img, max_hamming)


def phash_near_dup_over(img: DataFrame, max_hamming: int = PHASH_MAX_HAMMING) -> DataFrame:
    """The mm6 core over ANY (media_id, payload) relation — factored
    out (round 10) so the decodable-payload parity test can drive it
    with a crafted P6 corpus instead of the sf-dir media table."""
    from maggy_spark.functions.dedup import _bval, _first_match_and_hamming

    if max_hamming > PHASH_MAX_HAMMING:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the banding's exact-recall "
            f"radius {PHASH_MAX_HAMMING} (PHASH_BANDS={PHASH_BANDS})"
        )
    b, t = PHASH_BAND_BITS, PHASH_BITS
    sig = _phash_signatures(img)
    bands = sig.select(
        "media_id",
        "sigint",
        F.explode(
            F.array(*[F.lit(i << b) + _bval(F.col("sigint"), i, b, t) for i in range(PHASH_BANDS)])
        ).alias("band_key"),
    )
    a = bands.select(F.col("media_id").alias("id_a"), F.col("sigint").alias("sa"), "band_key")
    bb = bands.select(F.col("media_id").alias("id_b"), F.col("sigint").alias("sb"), "band_key")
    first_match, ham = _first_match_and_hamming(b, t)
    return (
        a.join(bb, "band_key")
        .where(F.col("id_a") < F.col("id_b"))
        .where(ham <= max_hamming)
        .where(first_match)
        .select("id_a", "id_b", ham.cast("int").alias("hamming"))
    )


# NB: _first_match_and_hamming unrolls over dedup.SIMHASH_BANDS, which
# must equal PHASH_BANDS for the reuse above to be sound — pinned by
# test_mm6_band_geometry_matches_dedup.
#
# ORACLE VALIDITY: this twin models the md5-STUB signature for EVERY
# payload, while the Spark side hashes real pixels for any payload
# that parses as P6 PPM (the always-available stdlib decode path, r8).
# The parity compare is therefore valid ONLY for corpora where no
# payload decodes — true of the synthetic text-payload fixtures, and
# pinned per-environment by test_mm6_oracle_environment_still_stub_only
# at the gate's sf0.01. A corpus with genuine P6 bytes must exclude
# decodable rows from the compare (the environment test is the tripwire).

MM6_SQL = f"""
WITH img AS (
    SELECT doc_id AS media_id, md5(text) AS h FROM documents WHERE doc_id % 3 = 0
),
sig AS (SELECT media_id, CAST(('0x' || substr(h, 1, 15)) AS BIGINT) AS sigint FROM img),
bands AS (
    SELECT media_id, sigint,
           (i * {1 << PHASH_BAND_BITS}) +
           ((sigint >> ({PHASH_BITS} - (i + 1) * {PHASH_BAND_BITS})) & {(1 << PHASH_BAND_BITS) - 1}) AS band_key
    FROM sig CROSS JOIN generate_series(0, {PHASH_BANDS - 1}) gs(i)
)
SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.sigint, b.sigint)) AS INTEGER) AS hamming
FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.media_id < b.media_id
WHERE bit_count(xor(a.sigint, b.sigint)) <= {PHASH_MAX_HAMMING}
"""


def mm6_decodable_sql(media_view: str = "media") -> str:
    """DuckDB twin of the mm6 pipeline for corpora WITH decodable
    images (closes the MM6_SQL validity-domain hole, VERDICT r9 item
    6): it models BOTH signature paths — the REAL pHash for P6 PPM
    payloads (header parse, ITU-R 601 luma, area resize, closed-form
    DCT-II with the fixed orthonormal basis, sign bits of the first
    60 AC coefficients) and the md5 stub for everything else — so the
    parity compare is valid on mixed corpora, not only all-stub ones.

    Scope (the documented fixture convention, asserted by the parity
    test): P6 payloads use the canonical header ``P6\\n{w} {h}\\n255\\n``
    with w and h positive multiples of 32 — which makes the area-
    resize buckets exact integer divisions in both engines. Payloads
    outside the convention take the stub path in both engines.

    Float note: both engines compute the DCT in float64 with
    different summation orders, so coefficients can differ in the
    last ulp — but only the coefficient SIGN reaches the hash, and on
    non-degenerate rasters |AC| is orders of magnitude above the
    error, so the compare is deterministic (the fixture uses seeded
    random rasters; constant images would put AC at exactly 0 and
    are excluded by construction).

    The blob is parsed via its HEX encoding (DuckDB cannot substr a
    BLOB — the round-7 lesson), with header digits recovered from the
    second nibble of each 0x3X hex pair so no chr() over raw raster
    bytes is needed.
    """
    hdr_re = "^50360A((?:3[0-9])+)20((?:3[0-9])+)0A3235350A"
    return f"""
WITH m AS (
    SELECT media_id, payload, hex(payload) AS hx, octet_length(payload) AS nb
    FROM {media_view}
),
parsed AS (
    SELECT media_id, payload, hx, nb,
           regexp_extract(hx, '{hdr_re}', 1) AS ws,
           regexp_extract(hx, '{hdr_re}', 2) AS hs
    FROM m
),
geom AS (
    SELECT media_id, hx, nb,
           cast(array_to_string(list_transform(range(1, length(ws)//2 + 1),
                i -> substr(ws, cast(i AS INTEGER)*2, 1)), '') AS INTEGER) AS w,
           cast(array_to_string(list_transform(range(1, length(hs)//2 + 1),
                i -> substr(hs, cast(i AS INTEGER)*2, 1)), '') AS INTEGER) AS h,
           9 + length(ws)//2 + length(hs)//2 AS hdr_len
    FROM parsed WHERE ws != '' AND hs != ''
),
dec AS (
    SELECT * FROM geom
    WHERE nb - hdr_len = w*h*3 AND w >= 32 AND h >= 32 AND w % 32 = 0 AND h % 32 = 0
),
pix AS (
    SELECT media_id, w, h,
           cast(p // w AS INTEGER) AS i, cast(p % w AS INTEGER) AS j,
           0.299 * cast(('0x' || substr(hx, (hdr_len + p*3)*2 + 1, 2)) AS INTEGER)
         + 0.587 * cast(('0x' || substr(hx, (hdr_len + p*3 + 1)*2 + 1, 2)) AS INTEGER)
         + 0.114 * cast(('0x' || substr(hx, (hdr_len + p*3 + 2)*2 + 1, 2)) AS INTEGER)
           AS gray
    FROM (SELECT media_id, w, h, hdr_len, hx, cast(u.p AS BIGINT) AS p
          FROM dec, unnest(range(0, w*h)) u(p))
),
thumb AS (
    SELECT media_id, (i*32)//h AS ti, (j*32)//w AS tj, avg(gray) AS g
    FROM pix GROUP BY media_id, (i*32)//h, (j*32)//w
),
basis AS (
    SELECT cast(uk.k AS INTEGER) AS k, cast(ui.i AS INTEGER) AS i,
           (CASE WHEN uk.k = 0 THEN sqrt(0.5) ELSE 1.0 END) * sqrt(2.0/32.0)
             * cos(pi() * (2.0*ui.i + 1.0) * uk.k / 64.0) AS d
    FROM unnest(range(0, 8)) uk(k), unnest(range(0, 32)) ui(i)
),
coef AS (
    SELECT t.media_id, bu.k AS u, bv.k AS v, sum(bu.d * t.g * bv.d) AS c
    FROM thumb t
    JOIN basis bu ON bu.i = t.ti
    JOIN basis bv ON bv.i = t.tj
    GROUP BY t.media_id, bu.k, bv.k
),
sig_dec AS (
    SELECT media_id,
           cast(sum(CASE WHEN c > 0 THEN (1::BIGINT << (60 - (u*8 + v)))
                         ELSE 0 END) AS BIGINT) AS sigint
    FROM coef WHERE u*8 + v BETWEEN 1 AND {PHASH_BITS}
    GROUP BY media_id
),
sig_stub AS (
    -- DuckDB 1.0 has no md5(BLOB); blob->varchar round-trips the raw
    -- bytes only while they are printable ASCII (anything else gets
    -- \\xHH-escaped), so the twin's STUB path is scoped to text
    -- payloads — exactly the rows that take it in the fixtures. The
    -- decodable path above has no such limit (it reads hex).
    SELECT media_id, cast(('0x' || substr(md5(cast(payload AS VARCHAR)), 1, 15)) AS BIGINT) AS sigint
    FROM m WHERE media_id NOT IN (SELECT media_id FROM dec)
),
sig AS (SELECT * FROM sig_dec UNION ALL SELECT * FROM sig_stub),
bands AS (
    SELECT media_id, sigint,
           (i * {1 << PHASH_BAND_BITS}) +
           ((sigint >> ({PHASH_BITS} - (i + 1) * {PHASH_BAND_BITS})) & {(1 << PHASH_BAND_BITS) - 1}) AS band_key
    FROM sig CROSS JOIN generate_series(0, {PHASH_BANDS - 1}) gs(i)
)
SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.sigint, b.sigint)) AS INTEGER) AS hamming
FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.media_id < b.media_id
WHERE bit_count(xor(a.sigint, b.sigint)) <= {PHASH_MAX_HAMMING}
"""


def validate_mm6_twin_corpus(payloads: dict) -> None:
    """Fail LOUDLY when a media corpus steps outside the validity
    domain of ``mm6_decodable_sql`` (the documented fixture
    convention) instead of producing a confusing parity diff later.
    The twin's decodable domain is strictly NARROWER than the Spark
    real path (canonical ``P6\\n{w} {h}\\n255\\n`` header only — no
    comments, no alternate whitespace, maxval exactly 255 — and w/h
    positive multiples of 32), and its stub path round-trips the
    payload through VARCHAR, which is byte-faithful only for
    printable ASCII. Every consumer of the twin must call this on
    its {media_id: payload-bytes} mapping BEFORE registering the
    media view; parity tests pin that it actually fires.

    The decoder probe resolves on the CALLER (driver), while mm6's
    signing stage resolves it lazily on the workers — the guard is
    therefore only as good as driver/executor environment parity
    (PIL present on both or neither), which is already a hard
    deployment requirement here (CLUSTER.md checklist #3: the
    shipped env must match the driver). In this container neither
    side has PIL, so the domains agree by construction.
    """
    import re

    decoder = _phash_decoder()  # the REAL domain, incl. PIL when installed
    bad: list = []
    for mid, payload in payloads.items():
        payload = bytes(payload)
        try:
            decoder(payload)
            spark_decodes = True
        except Exception:
            spark_decodes = False
        m = re.match(rb"^P6\n(\d+) (\d+)\n255\n", payload)
        twin_decodes = False
        if m is not None:
            w, h = int(m.group(1)), int(m.group(2))
            twin_decodes = (
                w >= 32
                and h >= 32
                and w % 32 == 0
                and h % 32 == 0
                and len(payload) - m.end() == w * h * 3
            )
        if spark_decodes != twin_decodes:
            bad.append((mid, "decodable by the Spark real path but outside the twin's "
                             "canonical-P6 convention" if spark_decodes else
                             "decodable by the twin but rejected by the Spark parser"))
        elif not spark_decodes and not all(32 <= b <= 126 for b in payload):
            bad.append((mid, "stub-path payload has non-printable-ASCII bytes — the "
                             "twin's VARCHAR round-trip would escape them, diverging "
                             "from md5 over the raw bytes"))
    if bad:
        lines = "; ".join(f"media_id={mid}: {why}" for mid, why in bad)
        raise ValueError(f"corpus violates the mm6_decodable_sql fixture convention — {lines}")


OPERATORS = [
    # mm1_decode_metadata rotated OUT round 13 (pre-declared in VERDICT
    # r12 item 1, per the recorded redundancy argument): gate-history
    # mm2/mm3 derive entirely from the mm1 metadata relation and its
    # decode plumbing is pinned by tests/test_multimodal.py; parity
    # continues in tests/test_offline_oracles.py at the gate's sf0.01.
    # The slot went to ann16_mmr_rerank (similarity.py).
    # mm2_frame_sample rotated OUT of the registry round 8 (derives
    # entirely from the gate-green mm1 metadata relation) to make room
    # for the pl13 corpus-build capstone under the 50-entry cap;
    # parity continues in tests/test_offline_oracles.py.
    # mm3_metadata_stats followed it in late round 8 for the same
    # reason (it is a 3-row rollup of that same mm1 relation); the
    # slot went to dd15_cross_source_dup.
]


# --- MM7: container-format sniffing (magic bytes) -----------------------

# (format, hex prefix at offset 0) — the classic magic numbers. RIFF is
# the container prefix whose real format comes from the type tag at
# byte offset 9; MP4 is detected by 'ftyp' at byte offset 5. These
# constants drive BOTH the Spark expression and the DuckDB twin, so
# the two sniffers cannot drift.
_RIFF_PREFIX = "52494646"
_RIFF_TAGS = [("wav", "57415645"), ("avi", "41564920"), ("webp", "57454250")]
_FTYP_HEX = "66747970"
_MAGIC_PREFIXES = [
    ("png", "89504E47"),
    ("jpeg", "FFD8FF"),
    ("gif", "47494638"),
    ("mp3", "494433"),
    ("flac", "664C6143"),
]


def sniff_format_expr(payload_col: str):
    """Sniffed container format of a binary column from its magic
    bytes — pure JVM-side hex/substring expressions, no decode, no
    Python. 'unknown' when nothing matches (e.g. raw text)."""
    hx = F.hex(F.substring(F.col(payload_col), 1, 16))
    riff_tag = F.substring(hx, 17, 8)
    riff = F.lit("riff")
    for name, tag in _RIFF_TAGS:
        riff = F.when(riff_tag == tag, name).otherwise(riff)
    cases = F.when(hx.startswith(_RIFF_PREFIX), riff)
    for name, prefix in _MAGIC_PREFIXES:
        cases = cases.when(hx.startswith(prefix), name)
    cases = cases.when(F.substring(hx, 9, 8) == _FTYP_HEX, "mp4")
    return cases.otherwise("unknown")


def mm7_container_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-hygiene check: sniff every payload's REAL container
    format from its magic bytes and compare it against the declared
    media_type — mislabeled uploads (a .wav that is actually an mp3,
    an 'image' that is HTML) are the first thing a multimodal ingest
    screen catches, before any decoder runs.

    Scale shape: per-row hex/substring expressions on the first 16
    payload bytes (parquet reads the binary column but the expression
    touches a fixed prefix); groupless narrow op, output row per
    payload. The synthetic corpus is raw text, so everything sniffs
    'unknown' and mismatch=true — the expression logic is pinned by
    crafted-payload unit tests. Not in the driver registry (50-entry
    cap); DuckDB parity in tests/test_offline_oracles.py.
    """
    m = media_table(spark, sf_dir)
    sniffed = sniff_format_expr("payload")
    consistent = (
        ((F.col("media_type") == "image") & sniffed.isin("png", "jpeg", "gif", "webp"))
        | ((F.col("media_type") == "audio") & sniffed.isin("wav", "mp3", "flac"))
        | ((F.col("media_type") == "video") & sniffed.isin("mp4", "avi", "riff"))
    )
    return m.select(
        "media_id",
        "media_type",
        sniffed.alias("sniffed_format"),
        (~consistent).alias("mismatch"),
    )


def _mm7_sql() -> str:
    """DuckDB twin GENERATED from the same magic constants as the
    Spark expression (it really sniffs the payload hex — a corpus
    whose text happens to start with an ASCII magic like 'ID3' or
    carry 'ftyp' at bytes 5-8 compares correctly, and a constant
    change cannot drift one engine)."""
    riff = "'riff'"
    for name, tag in _RIFF_TAGS:
        riff = f"CASE WHEN substr(hx, 17, 8) = '{tag}' THEN '{name}' ELSE {riff} END"
    prefix_whens = "\n            ".join(
        f"WHEN hx LIKE '{p}%' THEN '{n}'" for n, p in _MAGIC_PREFIXES
    )
    image = "', '".join(n for n, _ in [("png", ""), ("jpeg", ""), ("gif", ""), ("webp", "")])
    audio = "', '".join(["wav", "mp3", "flac"])
    video = "', '".join(["mp4", "avi", "riff"])
    return f"""
WITH m AS (
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           upper(substr(hex(encode(text)), 1, 32)) AS hx
    FROM documents
),
s AS (
    SELECT media_id, media_type,
           CASE WHEN hx LIKE '{_RIFF_PREFIX}%' THEN {riff}
            {prefix_whens}
            WHEN substr(hx, 9, 8) = '{_FTYP_HEX}' THEN 'mp4'
            ELSE 'unknown' END AS sniffed_format
    FROM m
)
SELECT media_id, media_type, sniffed_format,
       NOT ((media_type = 'image' AND sniffed_format IN ('{image}'))
         OR (media_type = 'audio' AND sniffed_format IN ('{audio}'))
         OR (media_type = 'video' AND sniffed_format IN ('{video}'))) AS mismatch
FROM s
"""


MM7_SQL = _mm7_sql()


# --- mm8: pHash ingest probe (asymmetric store screen) -------------------

# Crafted probe/store payloads UNIONed on both engines so the relation
# is non-vacuous at every fixture scale (the tx12/dd15 probe-union
# argument): 'alpha' matches two store copies (exercising fan-out),
# 'beta' one, 'gamma'/'delta' are the no-match controls. Negative ids
# cannot collide with corpus media ids.
MM8_PROBE_MEDIA: list[tuple[int, str]] = [
    (-1, "mm8 shared boilerplate frame alpha"),
    (-2, "mm8 shared boilerplate frame beta"),
    (-3, "mm8 probe-only payload gamma"),
]
MM8_STORE_MEDIA: list[tuple[int, str]] = [
    (-101, "mm8 shared boilerplate frame alpha"),
    (-102, "mm8 shared boilerplate frame alpha"),
    (-103, "mm8 shared boilerplate frame beta"),
    (-104, "mm8 store-only payload delta"),
]


def phash_probe_over(
    incoming: DataFrame, store_sigs: DataFrame, max_hamming: int = PHASH_MAX_HAMMING
) -> DataFrame:
    """mm6's banded machinery in ASYMMETRIC form: incoming
    (media_id, payload) rows are signed worker-side (the same
    real-pHash-or-stub mapInPandas core) and probed against a
    PRE-SIGNED static store relation (media_id, sigint) via the
    pigeonhole band join — the dd11 delta-side-only pattern applied
    to media. Output: (probe_id, store_id, hamming), every store
    member within ``max_hamming`` of each probe.

    Scale shape: per-probe cost is |bands| bucket lookups against the
    store's banded relation — independent of corpus history beyond
    the bucket population; no self-join, first-match band dedup so
    multi-band pairs never reshuffle through a DISTINCT. Works on a
    STREAMING `incoming` unchanged (all expressions are map-side; the
    join is stream-static)."""
    from maggy_spark.functions.dedup import _bval, _first_match_and_hamming

    if max_hamming > PHASH_MAX_HAMMING:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the banding's exact-recall "
            f"radius {PHASH_MAX_HAMMING} (PHASH_BANDS={PHASH_BANDS})"
        )
    b, t = PHASH_BAND_BITS, PHASH_BITS

    def banded(sig: DataFrame, idc: str, sc: str) -> DataFrame:
        return sig.select(
            F.col("media_id").alias(idc),
            F.col("sigint").alias(sc),
            F.explode(
                F.array(
                    *[F.lit(i << b) + _bval(F.col("sigint"), i, b, t) for i in range(PHASH_BANDS)]
                )
            ).alias("band_key"),
        )

    a = banded(_phash_signatures(incoming.select("media_id", "payload")), "probe_id", "sa")
    s = banded(store_sigs, "store_id", "sb")
    first_match, ham = _first_match_and_hamming(b, t)
    return (
        a.join(s, "band_key")
        .where(ham <= max_hamming)
        .where(first_match)
        .select("probe_id", "store_id", ham.cast("int").alias("hamming"))
    )


def mm8_store_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The static signed media store the ingest probe screens against:
    the EVEN image slice of the media table (media_id % 6 == 0 — image
    ids are multiples of 3) plus the crafted MM8_STORE_MEDIA rows,
    signed once and session-cached (the long-lived signatures-table
    pattern — a production store keeps sigint alongside the payload,
    so ingest never re-hashes history)."""
    from maggy_spark.plans.fixtures import session_cached

    def build() -> DataFrame:
        img = media_table(spark, sf_dir).where(F.col("media_type") == "image")
        store = img.where(F.col("media_id") % 6 == 0).select("media_id", "payload")
        crafted = spark.createDataFrame(
            [(i, bytearray(tx.encode("utf-8"))) for i, tx in MM8_STORE_MEDIA],
            "media_id bigint, payload binary",
        )
        return _phash_signatures(store.unionByName(crafted))

    return session_cached(spark, (sf_dir, "mm8_store_sigs"), build)


def mm8_phash_probe(
    spark: SparkSession, sf_dir: str, max_hamming: int = PHASH_MAX_HAMMING
) -> DataFrame:
    """Deterministic batch form of the media ingest screen (the ing1
    convention: store = even image slice, feed = odd) — each probe
    payload signed and screened against `mm8_store_signatures`. The
    streaming twin (`streaming.phash_alert_stream`) is THIS relation
    with the probe side arriving as micro-batches. Oracle validity:
    the fixture payloads are utf-8 text, so both engines take the md5
    stub path (the MM6_SQL argument, environment-pinned at sf0.01);
    `validate_mm6_twin_corpus` guards any future decodable fixture.
    Not in the driver registry (50-entry cap); DuckDB parity in
    tests/test_offline_oracles.py."""
    img = media_table(spark, sf_dir).where(F.col("media_type") == "image")
    probe = img.where(F.col("media_id") % 6 == 3).select("media_id", "payload")
    crafted = spark.createDataFrame(
        [(i, bytearray(tx.encode("utf-8"))) for i, tx in MM8_PROBE_MEDIA],
        "media_id bigint, payload binary",
    )
    return phash_probe_over(
        probe.unionByName(crafted), mm8_store_signatures(spark, sf_dir), max_hamming
    )


def _mm8_values(rows: list) -> str:
    # Escape single quotes so a future crafted payload with an
    # apostrophe can't produce malformed oracle SQL or a silent
    # text mismatch vs the Spark side (ADVICE r11). The Spark side
    # uses the raw python string, so '' -> ' here keeps both equal.
    return ", ".join(
        "(cast({} AS BIGINT), '{}')".format(i, tx.replace("'", "''"))
        for i, tx in rows
    )


MM8_SQL = f"""
WITH img AS (SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 0),
probe0 AS (
    SELECT media_id, text FROM img WHERE media_id % 6 = 3
    UNION ALL SELECT * FROM (VALUES {_mm8_values(MM8_PROBE_MEDIA)}) p(media_id, text)
),
store0 AS (
    SELECT media_id, text FROM img WHERE media_id % 6 = 0
    UNION ALL SELECT * FROM (VALUES {_mm8_values(MM8_STORE_MEDIA)}) s(media_id, text)
),
psig AS (SELECT media_id, CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS sigint FROM probe0),
ssig AS (SELECT media_id, CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS sigint FROM store0),
pband AS (
    SELECT media_id, sigint,
           (i * {1 << PHASH_BAND_BITS}) +
           ((sigint >> ({PHASH_BITS} - (i + 1) * {PHASH_BAND_BITS})) & {(1 << PHASH_BAND_BITS) - 1}) AS band_key
    FROM psig CROSS JOIN generate_series(0, {PHASH_BANDS - 1}) gs(i)
),
sband AS (
    SELECT media_id, sigint,
           (i * {1 << PHASH_BAND_BITS}) +
           ((sigint >> ({PHASH_BITS} - (i + 1) * {PHASH_BAND_BITS})) & {(1 << PHASH_BAND_BITS) - 1}) AS band_key
    FROM ssig CROSS JOIN generate_series(0, {PHASH_BANDS - 1}) gs(i)
)
SELECT DISTINCT p.media_id AS probe_id, s.media_id AS store_id,
       CAST(bit_count(xor(p.sigint, s.sigint)) AS INTEGER) AS hamming
FROM pband p JOIN sband s ON p.band_key = s.band_key
WHERE bit_count(xor(p.sigint, s.sigint)) <= {PHASH_MAX_HAMMING}
"""


# --- mm9: multimodal-aware sequence packing -------------------------------

MM9_PATCH = 14        # ViT patch side: image tokens = ceil(w/14)*ceil(h/14)
MM9_AUDIO_DIV = 320   # 16 kHz bytes -> 50 tokens/sec = n_bytes DIV 320
MM9_VID_FRAME_TOKENS = 256  # per sampled frame (16x16 low-res grid)
MM9_VID_EVERY = 30    # mm2's frame-sampling stride


def mm9_multimodal_pack_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pl7's sequence packing extended to MULTIMODAL token budgets —
    the packing a vision-language training pipeline actually runs
    (LLaVA-style interleaving: every media attachment consumes
    context positions alongside the text): each doc's cost is its
    text BPE-ish tokens PLUS its attachment's vision/audio tokens —
    image = ceil(w/P)·ceil(h/P) ViT patches (P=14), audio =
    bytes DIV 320 (16 kHz -> 50 tokens/sec), video = |mm2's sampled
    frames| · 256 patch tokens — and the pack windows are computed
    over that combined cost with pl7's exact integer cumsum core.
    Output: (doc_id, media_type, text_tokens, media_tokens, shard,
    tok_start, window_start, window_end, n_windows).

    The media dimensions come through mm1's REAL decode path
    (mapInPandas over Arrow batches; stub-decoded deterministically on
    this corpus), so the Spark plan exercises the actual multimodal
    plumbing while the DuckDB twin replays the stub's closed form.
    Determinism: every cost is an exact integer (ceil of small-int /
    14.0 is exact in double far past these magnitudes; audio DIV;
    frame count from an integer list expression); the pack core is
    pl7's. Scale: mm1 is a narrow zero-shuffle pass; the pack is
    pl7's per-shard window — same plan shape that swept sf1/sf10.
    Not in the driver registry (50-entry cap); DuckDB parity in
    tests/test_offline_oracles.py."""
    from maggy_spark.functions.pipeline import pack_plan
    from maggy_spark.plans.fixtures import load_table

    meta = mm1_decode_metadata(spark, sf_dir).select(
        F.col("media_id").alias("doc_id"), "media_type", "n_bytes",
        "width", "height", "n_frames",
    )
    text_toks = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.aggregate(
            F.split(F.col("text"), " "),
            F.lit(0).cast("bigint"),
            lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("bigint"),
        ).alias("text_tokens"),
    )
    sampled_frames = F.size(
        F.array_distinct(
            F.concat(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(MM9_VID_EVERY)),
                F.array(F.col("n_frames") - 1),
            )
        )
    ).cast("bigint")
    media_tokens = (
        F.when(
            F.col("media_type") == "image",
            (F.ceil(F.col("width") / float(MM9_PATCH)) * F.ceil(F.col("height") / float(MM9_PATCH))).cast("bigint"),
        )
        .when(F.col("media_type") == "audio", F.expr(f"n_bytes DIV {MM9_AUDIO_DIV}"))
        .otherwise(sampled_frames * MM9_VID_FRAME_TOKENS)
    )
    combined = meta.join(text_toks, "doc_id").select(
        "doc_id", "media_type", "text_tokens", media_tokens.alias("media_tokens")
    )
    packed = pack_plan(
        combined.select("doc_id", (F.col("text_tokens") + F.col("media_tokens")).alias("bpe_tokens"))
    )
    return packed.join(
        combined.select("doc_id", "media_type", "text_tokens", "media_tokens"), "doc_id"
    ).select(
        "doc_id", "media_type", "text_tokens", "media_tokens",
        "shard", "tok_start", "window_start", "window_end", "n_windows",
    )


def mm9_sql() -> str:
    from maggy_spark.functions.pipeline import PACK_CTX, PACK_SHARDS

    return f"""
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         cast(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         CAST('0x' || substr(md5(text), 1, 8) AS UBIGINT) AS seed,
         cast(list_sum(list_transform(str_split(text, ' '),
              t -> cast(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS text_tokens
  FROM documents
), dims AS (
  SELECT doc_id, media_type, text_tokens,
         CAST(CASE media_type WHEN 'image' THEN 64 + seed % 512 ELSE 0 END AS BIGINT) AS width,
         CAST(CASE media_type WHEN 'image' THEN 64 + (seed // 512) % 512 ELSE 0 END AS BIGINT) AS height,
         CAST(CASE media_type WHEN 'video' THEN 1 + seed % 300 ELSE 0 END AS BIGINT) AS n_frames,
         n_bytes
  FROM m
), cost AS (
  SELECT doc_id, media_type, text_tokens,
         CASE media_type
           WHEN 'image' THEN cast(ceil(width / {MM9_PATCH}.0) * ceil(height / {MM9_PATCH}.0) AS BIGINT)
           WHEN 'audio' THEN n_bytes // {MM9_AUDIO_DIV}
           ELSE cast(len(list_distinct(list_append(
                    range(0, n_frames, {MM9_VID_EVERY}), n_frames - 1))) AS BIGINT) * {MM9_VID_FRAME_TOKENS}
         END AS media_tokens
  FROM dims
), t AS (
  SELECT doc_id, media_type, text_tokens, media_tokens,
         cast(doc_id % {PACK_SHARDS} AS INTEGER) AS shard,
         text_tokens + media_tokens AS bpe_tokens
  FROM cost
), c AS (
  SELECT *, cast(sum(bpe_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS cum_end
  FROM t
)
SELECT doc_id, media_type, text_tokens, media_tokens, shard,
       cast(cum_end - bpe_tokens AS BIGINT) AS tok_start,
       cast(floor((cum_end - bpe_tokens) / {PACK_CTX}.0) AS BIGINT) AS window_start,
       cast(floor((cum_end - 1) / {PACK_CTX}.0) AS BIGINT) AS window_end,
       cast(floor((cum_end - 1) / {PACK_CTX}.0)
            - floor((cum_end - bpe_tokens) / {PACK_CTX}.0) + 1 AS BIGINT) AS n_windows
FROM c
"""


MM9_SQL = mm9_sql()
