"""Native TFRecord / tf.Example scan — closes the round-9 "What's
missing" format gap: the reference's LOCO ablator builds its datasets
from TFRecord feature stores (`maggy/ablation/ablator/loco.py:41-80`,
`td.tf_data(...).tf_record_dataset(...)` with the ablated feature
removed from `feature_names`), while the rebuild read parquet. This
module reads the SAME container natively — pure stdlib + numpy, no
tensorflow/protobuf dependency — so a reference user's TFRecord
shards load without conversion.

Both wire formats are public:

- TFRecord framing (TensorFlow's record writer): per record a
  little-endian uint64 length, a masked CRC-32C of those 8 length
  bytes, the payload, and a masked CRC-32C of the payload, where
  ``mask(crc) = ((crc >> 15 | crc << 17) + 0xa282ead8) mod 2^32``.
- ``tf.Example`` protobuf (feature.proto/example.proto): Example{1:
  Features}, Features{1: map<string, Feature>}, Feature{1: BytesList,
  2: FloatList, 3: Int64List}, numeric lists packed.

Spark shape: `spark.read.format("binaryFile")` hands each shard file
to one task (TFRecord is not splittable — no sync markers), and an
Arrow-batched ``mapInPandas`` parses records into typed columns.
Feature-store layouts shard into many files (the reference's training
datasets are written `part-r-*` per executor), so file-count IS the
parallelism — same contract as TFRecordDataset with
``num_parallel_reads``. Column pruning happens at PARSE time: only
the features named in the schema are materialized, so the LOCO scan
never holds the ablated column in memory at all.
"""

from __future__ import annotations

import struct
from collections.abc import Iterable, Iterator

import numpy as np

# --- CRC-32C (Castagnoli, reflected 0x82F63B78) — table-driven ---------

_CRC_TABLE: np.ndarray | None = None


def _crc_table() -> np.ndarray:
    global _CRC_TABLE
    if _CRC_TABLE is None:
        t = np.empty(256, dtype=np.uint32)
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ (0x82F63B78 if c & 1 else 0)
            t[i] = c
        _CRC_TABLE = t
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    """Pure-python table CRC-32C. Sequential by nature (the register
    feeds back), so it costs ~1 us/byte — fine for the 8-byte length
    headers always verified and the KB-scale payloads of typical
    Example records; pass ``verify_crc=False`` to the readers to skip
    payload checksums on bulk scans."""
    table = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ int(table[(crc ^ b) & 0xFF])
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# --- record framing -----------------------------------------------------


def iter_records(data: bytes, verify_crc: bool = True) -> Iterator[bytes]:
    """Yield record payloads from TFRecord file bytes. Length CRCs are
    always verified (8 bytes, catches desync/corruption cheaply);
    payload CRCs only when ``verify_crc``."""
    pos, n = 0, len(data)
    while pos < n:
        if n - pos < 12:
            raise ValueError(f"truncated TFRecord header at byte {pos}")
        header = data[pos : pos + 8]
        (length,) = struct.unpack("<Q", header)
        (lcrc,) = struct.unpack("<I", data[pos + 8 : pos + 12])
        if _masked_crc(header) != lcrc:
            raise ValueError(f"length CRC mismatch at byte {pos}")
        start = pos + 12
        end = start + length
        if end + 4 > n:
            raise ValueError(f"truncated TFRecord payload at byte {pos}")
        payload = bytes(data[start:end])
        (pcrc,) = struct.unpack("<I", data[end : end + 4])
        if verify_crc and _masked_crc(payload) != pcrc:
            raise ValueError(f"payload CRC mismatch at byte {pos}")
        yield payload
        pos = end + 4


# --- tf.Example protobuf ------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result, shift = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("malformed varint")


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _parse_fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """(field_number, wire_type, value) over a protobuf message body.
    LEN fields yield bytes; VARINT ints; I32/I64 raw 4/8 bytes."""
    pos, n = 0, len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            v, pos = _read_varint(buf, pos)
            yield field, wt, v
        elif wt == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            yield field, wt, buf[pos : pos + ln]
            pos += ln
        elif wt == 5:  # 32-bit
            yield field, wt, buf[pos : pos + 4]
            pos += 4
        elif wt == 1:  # 64-bit
            yield field, wt, buf[pos : pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")


def _parse_feature(buf: bytes) -> tuple[str, list]:
    """One Feature message -> (kind, values). Protobuf merge
    semantics allow a Feature's list to arrive as REPEATED embedded
    chunks (some third-party writers split large lists): same-kind
    chunks CONCATENATE (repeated fields merge), while a chunk of a
    DIFFERENT kind replaces what came before (Feature.kind is a
    oneof — setting another member clears the previous one)."""
    kind: str | None = None
    out: list = []
    for field, wt, val in _parse_fields(buf):
        if wt != 2 or field not in (1, 2, 3):
            continue
        this = {1: "bytes", 2: "float", 3: "int64"}[field]
        if this != kind:  # oneof switch: later member wins
            kind, out = this, []
        if this == "bytes":
            # w == 2 guard: a varint-encoded inner field would reach
            # bytes(int) and fabricate a zero-filled buffer of that
            # length — reject non-LEN encodings instead of allocating
            out.extend(bytes(v) for f, w, v in _parse_fields(val) if f == 1 and w == 2)
        elif this == "float":
            for f, w, v in _parse_fields(val):
                if f == 1 and w in (2, 5):  # packed run or single I32
                    out.extend(np.frombuffer(v, dtype="<f4").tolist())
        else:  # int64
            for f, w, v in _parse_fields(val):
                if f != 1:
                    continue
                if w == 2:  # packed varints
                    p = 0
                    while p < len(v):
                        x, p = _read_varint(v, p)
                        out.append(_signed64(x))
                elif w == 0:
                    out.append(_signed64(v))
    return (kind or "bytes"), out


def parse_example(payload: bytes) -> dict[str, tuple[str, list]]:
    """tf.Example bytes -> {feature_name: (kind, values)}."""
    feats: dict[str, tuple[str, list]] = {}
    for field, wt, val in _parse_fields(payload):
        if field != 1 or wt != 2:  # Example.features
            continue
        for f2, w2, entry in _parse_fields(val):
            if f2 != 1 or w2 != 2:  # Features.feature map entry
                continue
            name, feature = None, None
            for f3, w3, v3 in _parse_fields(entry):
                if f3 == 1 and w3 == 2:
                    name = v3.decode("utf-8")
                elif f3 == 2 and w3 == 2:
                    feature = v3
            if name is not None:
                feats[name] = _parse_feature(feature or b"")
    return feats


# --- writer (interop/export + test fixtures) ----------------------------


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _len_field(field: int, payload: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def encode_example(features: dict[str, object], kinds: dict[str, str] | None = None) -> bytes:
    """{name: value} -> tf.Example bytes. Ints/int-lists become
    Int64List (packed), floats FloatList (packed float32 — the
    proto's precision), str/bytes and their lists BytesList.

    Kind is inferred from the WHOLE list, not its first element:
    mixed-type lists raise TypeError instead of mis-encoding. An
    empty list is ambiguous — pass ``kinds={name: 'bytes'|'float'|
    'int64'}`` to pin its encoding (default: empty FloatList, the
    historical behavior, now explicit)."""
    body = b""
    for name, value in features.items():
        vals = value if isinstance(value, (list, tuple, np.ndarray)) else [value]
        vals = list(vals)
        hint = (kinds or {}).get(name)
        if hint is not None and hint not in ("bytes", "float", "int64"):
            raise ValueError(f"feature {name!r}: unknown kind hint {hint!r}")
        if not vals:
            kind = hint or "float"
        elif all(isinstance(v, (bytes, str)) for v in vals):
            kind = "bytes"
        elif all(isinstance(v, (bool, np.bool_, int, np.integer)) for v in vals):
            kind = "int64"
        elif all(
            isinstance(v, (bool, np.bool_, int, float, np.integer, np.floating)) for v in vals
        ):
            kind = "float"
        else:
            raise TypeError(
                f"feature {name!r}: mixed or unsupported value types "
                f"{sorted({type(v).__name__ for v in vals})}"
            )
        if hint and vals and kind != hint:
            if hint == "float" and kind == "int64":  # ints are valid floats
                kind = "float"
            else:
                raise TypeError(f"feature {name!r}: values are {kind}, hint says {hint}")
        if kind == "bytes":
            bl = b"".join(
                _len_field(1, v.encode("utf-8") if isinstance(v, str) else v) for v in vals
            )
            feature = _len_field(1, bl)
        elif kind == "int64":
            packed = b"".join(_varint(int(v) & ((1 << 64) - 1)) for v in vals)
            feature = _len_field(3, _len_field(1, packed))
        else:
            packed = np.asarray(vals, dtype="<f4").tobytes()
            feature = _len_field(2, _len_field(1, packed))
        entry = _len_field(1, name.encode("utf-8")) + _len_field(2, feature)
        body += _len_field(1, entry)
    return _len_field(1, body)


def write_tfrecord_file(examples: Iterable[dict], path: str) -> str:
    """Frame encoded Examples into one TFRecord file (driver-side
    helper for interop export and fixtures; distributed WRITES should
    stay parquet — `write_training_shards` — per SURVEY §2.1 S2)."""
    with open(path, "wb") as f:
        for ex in examples:
            payload = encode_example(ex)
            header = struct.pack("<Q", len(payload))
            f.write(header)
            f.write(struct.pack("<I", _masked_crc(header)))
            f.write(payload)
            f.write(struct.pack("<I", _masked_crc(payload)))
    return path


# --- Spark scan ----------------------------------------------------------

_SCALAR_TYPES = {"bigint", "double", "string", "binary"}
_ARRAY_TYPES = {"array<bigint>", "array<double>", "array<string>", "array<binary>"}


def _convert(kind_vals: tuple[str, list] | None, typ: str):
    if kind_vals is None:
        return None
    _kind, vals = kind_vals
    if typ.startswith("array<"):
        inner = typ[6:-1]
        return [_convert1(v, inner) for v in vals]
    return _convert1(vals[0], typ) if vals else None


def _convert1(v, typ: str):
    if typ == "bigint":
        return int(v)
    if typ == "double":
        return float(v)
    if typ == "string":
        return v.decode("utf-8") if isinstance(v, bytes) else str(v)
    if typ == "binary":
        return bytes(v) if not isinstance(v, bytes) else v
    raise ValueError(f"unsupported tfrecord column type {typ!r}")


def read_tfexamples(spark, path: str, feature_schema: dict[str, str], verify_crc: bool = True):
    """Distributed tf.Example scan: (path glob) + {feature: spark
    type} -> DataFrame. Types: bigint/double/string/binary and their
    array<> forms (Int64List/FloatList/BytesList respectively; a
    scalar type takes the list's first element, TFRecordDataset's
    ``FixedLenFeature([])`` convention). Features absent from the
    schema are skipped at parse time (column pruning); absent from a
    record yield NULL."""
    import pandas as pd

    bad = set(feature_schema.values()) - _SCALAR_TYPES - _ARRAY_TYPES
    if bad:
        raise ValueError(f"unsupported tfrecord column types: {sorted(bad)}")
    names = list(feature_schema)
    schema_str = ", ".join(f"`{k}` {t}" for k, t in feature_schema.items())

    def parse_batches(it):
        for pdf in it:
            rows = []
            for content in pdf["content"]:
                for payload in iter_records(bytes(content), verify_crc):
                    feats = parse_example(payload)
                    rows.append(
                        tuple(_convert(feats.get(n), feature_schema[n]) for n in names)
                    )
            yield pd.DataFrame(rows, columns=names)

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(parse_batches, schema_str)


def loco_tfrecord_scan(
    spark, path: str, feature_schema: dict[str, str], ablated_feature: str | None = None,
    verify_crc: bool = True,
):
    """The reference LOCO dataset shape over native TFRecord shards
    (`maggy/ablation/ablator/loco.py:41-80`: feature_names minus the
    ablated one): scan with the ablated feature REMOVED from the
    parse schema, so the dropped column is never materialized — the
    same column-pruning semantics the parquet ablation scan
    (ablation.py S1) provides."""
    cols = {k: t for k, t in feature_schema.items() if k != ablated_feature}
    if ablated_feature is not None and len(cols) == len(feature_schema):
        raise ValueError(f"ablated feature {ablated_feature!r} not in schema")
    return read_tfexamples(spark, path, cols, verify_crc)
