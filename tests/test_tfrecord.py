"""Native TFRecord/tf.Example scan (sources/tfrecord.py) and the
petastorm interop shim — the two round-9 "What's missing" format
gaps. The wire formats are hand-rolled on BOTH sides here (writer and
reader share only the public constants), so the roundtrip pins the
framing/proto logic against the fixture values, the CRC core is
pinned against the public CRC-32C test vector, and malformed inputs
must fail loudly (TFRecordDataset's behavior), never truncate
silently."""

from __future__ import annotations

import numpy as np
import pytest

from maggy_spark.sources import tfrecord as tfr


def test_crc32c_public_vector():
    # the canonical CRC-32C check value (RFC 3720 appendix / Castagnoli)
    assert tfr.crc32c(b"123456789") == 0xE3069283
    assert tfr.crc32c(b"") == 0


def _examples(n: int, offset: int = 0):
    return [
        {
            "id": offset + i,
            "label": float(offset + i) / 8.0,
            "name": f"doc-{offset + i}",
            "emb": [0.5 * (offset + i), -1.25, 3.0],
            "tags": [b"a", f"t{i}".encode()],
            "counts": [offset + i, -7, 1 << 40],
        }
        for i in range(n)
    ]


SCHEMA = {
    "id": "bigint",
    "label": "double",
    "name": "string",
    "emb": "array<double>",
    "tags": "array<binary>",
    "counts": "array<bigint>",
}


def test_tfrecord_roundtrip_two_shards(spark, tmp_path):
    tfr.write_tfrecord_file(_examples(40), str(tmp_path / "part-r-0.tfrecord"))
    tfr.write_tfrecord_file(_examples(25, 100), str(tmp_path / "part-r-1.tfrecord"))

    df = tfr.read_tfexamples(spark, str(tmp_path / "*.tfrecord"), SCHEMA)
    rows = {r.id: r for r in df.collect()}
    assert len(rows) == 65
    want = {e["id"]: e for e in _examples(40) + _examples(25, 100)}
    for i, e in want.items():
        r = rows[i]
        # floats ride the proto as float32 — compare at that precision
        assert r.label == float(np.float32(e["label"]))
        assert r.name == e["name"]
        assert r.emb == [float(np.float32(v)) for v in e["emb"]]
        assert [bytes(t) for t in r.tags] == e["tags"]
        assert list(r.counts) == e["counts"]  # incl. negative + >32-bit
    assert dict(df.dtypes)["counts"] == "array<bigint>"


def test_tfrecord_missing_feature_is_null_and_pruning(spark, tmp_path):
    exs = _examples(3)
    del exs[1]["label"]
    tfr.write_tfrecord_file(exs, str(tmp_path / "f.tfrecord"))
    df = tfr.read_tfexamples(spark, str(tmp_path / "f.tfrecord"), SCHEMA)
    by_id = {r.id: r for r in df.collect()}
    assert by_id[1].label is None and by_id[0].label is not None
    # pruning: a schema naming only two features parses only those
    slim = tfr.read_tfexamples(
        spark, str(tmp_path / "f.tfrecord"), {"id": "bigint", "name": "string"}
    )
    assert slim.columns == ["id", "name"] and slim.count() == 3


def test_loco_tfrecord_scan_drops_ablated_feature(spark, tmp_path):
    """Reference parity (maggy/ablation/ablator/loco.py:41-80): the
    ablated feature is REMOVED from feature_names before the dataset
    builds — here it never even parses."""
    tfr.write_tfrecord_file(_examples(5), str(tmp_path / "f.tfrecord"))
    df = tfr.loco_tfrecord_scan(spark, str(tmp_path / "f.tfrecord"), SCHEMA, "emb")
    assert "emb" not in df.columns and df.count() == 5
    with pytest.raises(ValueError, match="not in schema"):
        tfr.loco_tfrecord_scan(spark, str(tmp_path / "f.tfrecord"), SCHEMA, "nope")


def test_tfrecord_corruption_fails_loudly(tmp_path):
    p = str(tmp_path / "f.tfrecord")
    tfr.write_tfrecord_file(_examples(2), p)
    data = bytearray(open(p, "rb").read())
    with pytest.raises(ValueError, match="truncated"):
        list(tfr.iter_records(bytes(data[:-5])))
    data[14] ^= 0xFF  # flip a payload byte -> payload CRC mismatch
    with pytest.raises(ValueError, match="payload CRC"):
        list(tfr.iter_records(bytes(data)))
    assert len(list(tfr.iter_records(bytes(data), verify_crc=False))) == 2
    data[9] ^= 0xFF  # length CRC is ALWAYS verified
    with pytest.raises(ValueError, match="length CRC"):
        list(tfr.iter_records(bytes(data), verify_crc=False))


def test_petastorm_shim_gated_like_frameworks():
    """Without petastorm (this container) the shim must raise the
    pointer to shard_parquet_reader at CALL time; rank validation
    fires first either way."""
    from maggy_spark.sources.data import petastorm_reader

    with pytest.raises(ValueError, match="outside world"):
        petastorm_reader("/tmp/x", rank=3, world_size=2)
    try:
        import petastorm  # noqa: F401

        pytest.skip("petastorm installed: shim takes the real path")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="shard_parquet_reader"):
        petastorm_reader("/tmp/x", rank=0, world_size=1)


def test_parse_feature_concatenates_split_chunks():
    """Protobuf merge semantics: a Feature's list may arrive as
    repeated embedded-message chunks (some third-party writers split
    large lists). Same-kind chunks must CONCATENATE, not stop at the
    first; a later chunk of a DIFFERENT kind replaces the earlier
    one (Feature.kind is a oneof)."""
    # two BytesList chunks: [b"ab"] then [b"cd", b"ef"]
    chunk1 = tfr._len_field(1, tfr._len_field(1, b"ab"))
    chunk2 = tfr._len_field(1, tfr._len_field(1, b"cd") + tfr._len_field(1, b"ef"))
    kind, vals = tfr._parse_feature(chunk1 + chunk2)
    assert (kind, vals) == ("bytes", [b"ab", b"cd", b"ef"])

    # two Int64List chunks with packed varints: [1,2] then [3]
    packed12 = tfr._varint(1) + tfr._varint(2)
    i1 = tfr._len_field(3, tfr._len_field(1, packed12))
    i2 = tfr._len_field(3, tfr._len_field(1, tfr._varint(3)))
    kind, vals = tfr._parse_feature(i1 + i2)
    assert (kind, vals) == ("int64", [1, 2, 3])

    # two FloatList chunks (packed float32): [1.5] then [2.5, 3.0]
    f1 = tfr._len_field(2, tfr._len_field(1, np.asarray([1.5], "<f4").tobytes()))
    f2 = tfr._len_field(2, tfr._len_field(1, np.asarray([2.5, 3.0], "<f4").tobytes()))
    kind, vals = tfr._parse_feature(f1 + f2)
    assert (kind, vals) == ("float", [1.5, 2.5, 3.0])

    # oneof switch: BytesList chunk then Int64List chunk -> later
    # member wins and the earlier values are cleared
    kind, vals = tfr._parse_feature(chunk1 + i1)
    assert (kind, vals) == ("int64", [1, 2])


def test_parse_feature_rejects_varint_bytes_chunk():
    """A malformed BytesList whose inner field 1 is varint-encoded
    (wiretype 0) must be DROPPED, not turned into a zero-filled
    buffer of that length — bytes(int) semantics would let an
    adversarial N allocate terabytes on the worker."""
    # Feature { bytes_list { 1: varint 5 } } — field 1 wiretype 0
    bad_inner = tfr._varint((1 << 3) | 0) + tfr._varint(5)
    payload = tfr._len_field(1, bad_inner)
    kind, vals = tfr._parse_feature(payload)
    assert (kind, vals) == ("bytes", [])
    # a well-formed chunk alongside it still parses
    good = tfr._len_field(1, bad_inner + tfr._len_field(1, b"ok"))
    assert tfr._parse_feature(good) == ("bytes", [b"ok"])


def test_encode_example_numpy_bool_and_hint_validation():
    """np.bool_ arrays (dtype=bool ndarrays are a supported container)
    encode as Int64List like Python bools; an unknown kind hint raises
    ValueError even when the list is non-empty."""
    payload = tfr.encode_example({"x": np.array([True, False, True])})
    assert tfr.parse_example(payload)["x"] == ("int64", [1, 0, 1])
    with pytest.raises(ValueError, match="unknown kind hint"):
        tfr.encode_example({"x": [1]}, kinds={"x": "f32"})


def test_encode_example_validates_kinds():
    """Kind inference covers the WHOLE list: mixed-type lists raise
    instead of mis-encoding; empty lists take an explicit kind hint
    (default float, the historical behavior); int values under a
    float hint coerce (ints are valid floats)."""
    with pytest.raises(TypeError, match="mixed or unsupported"):
        tfr.encode_example({"x": ["s", 1, 2]})

    # empty list + hint roundtrips with the hinted kind
    for hint, want in [("bytes", "bytes"), ("int64", "int64"), ("float", "float")]:
        payload = tfr.encode_example({"x": []}, kinds={"x": hint})
        kind, vals = tfr.parse_example(payload)["x"]
        assert (kind, vals) == (want, [])
    # default for an unhinted empty list stays FloatList
    kind, vals = tfr.parse_example(tfr.encode_example({"x": []}))["x"]
    assert (kind, vals) == ("float", [])

    # int values + float hint coerce; contradictory hint raises
    kind, vals = tfr.parse_example(
        tfr.encode_example({"x": [1, 2]}, kinds={"x": "float"})
    )["x"]
    assert (kind, vals) == ("float", [1.0, 2.0])
    with pytest.raises(TypeError, match="hint says"):
        tfr.encode_example({"x": [1, 2]}, kinds={"x": "bytes"})
    with pytest.raises(ValueError, match="unknown kind hint"):
        tfr.encode_example({"x": []}, kinds={"x": "f32"})
