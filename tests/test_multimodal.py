"""Multimodal binary-column operators: metadata, fingerprint dedup,
mapInPandas decode plumbing, frame sampling, NULL payloads."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions import multimodal as M


def _media(spark):
    rows = [
        (1, b"hello world, this is payload one"),
        (2, b"hello world, this is payload one"),  # exact dup of 1
        (3, b"a completely different payload!!"),
        (4, None),
        (5, b""),
    ]
    return spark.createDataFrame(rows, "media_id long, content binary")


def test_metadata_columns(spark):
    df = _media(spark)
    got = {
        r.media_id: (r.n, r.magic)
        for r in df.select(
            "media_id",
            M.media_size_bytes("content").alias("n"),
            M.media_magic_hex("content").alias("magic"),
        ).collect()
    }
    assert got[1] == (32, "68656C6C")  # 'hell'
    assert got[4] == (None, None)
    assert got[5] == (0, "")


def test_fingerprint_dedup_and_determinism(spark):
    df = _media(spark).filter(F.col("content").isNotNull())
    out = M.fingerprint_dedup(df, "media_id", "content").collect()
    ids = sorted(r.media_id for r in out)
    assert ids == [1, 3, 5]  # 2 deduped into 1; empty payload fp=0 kept
    fps = {r.media_id: r.fingerprint for r in out}
    assert fps[5] == 0
    # identical payloads share the fingerprint; different payloads don't
    all_fp = {r.media_id: r.fp for r in df.select(
        "media_id", M.byte_fingerprint("content").alias("fp")).collect()}
    assert all_fp[1] == all_fp[2] != all_fp[3]


def test_decode_thumbnails_plumbing(spark):
    out = {r.media_id: r for r in M.decode_thumbnails(_media(spark)).collect()}
    r1 = out[1]
    assert (r1.width, r1.height) == ((32 % 640) + 16, (32 % 480) + 16)
    assert bytes(r1.thumb) == b"hello world, thi"
    assert out[4].width is None and out[4].thumb is None
    # schema is the declared THUMBNAIL_SCHEMA
    assert M.decode_thumbnails(_media(spark)).columns == [
        "media_id", "width", "height", "thumb"]


def test_frame_sample(spark):
    df = _media(spark)
    got = {r.media_id: r.s for r in df.select(
        "media_id", M.frame_sample("content", 16).alias("s")).collect()}
    assert bytes(got[1]) == b"hello world, this is payload one"[::16]
    assert got[4] is None
    assert bytes(got[5]) == b""


def test_decode_codec_gate(monkeypatch):
    """_decode_image uses the real codec when Pillow is present, the
    deterministic fake otherwise — and falls back to the fake (never
    raises) when the real codec can't parse the payload."""
    payload = b"not an image at all"
    fake = M._fake_decode(payload)

    # no PIL → deterministic fake
    monkeypatch.setattr(M, "HAVE_PIL", False)
    assert M._decode_image(payload) == fake

    # PIL present and payload parseable → real path (stubbed codec)
    class _StubImage:
        size = (400, 200)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def thumbnail(self, box):
            self.size = (box[0], box[1] // 2)

        def convert(self, mode):
            return self

        def save(self, buf, format):
            buf.write(b"PNGDATA")

    class _StubModule:
        @staticmethod
        def open(bio):
            if bio.read(3) != b"IMG":
                raise OSError("cannot identify image file")
            return _StubImage()

    monkeypatch.setattr(M, "HAVE_PIL", True)
    monkeypatch.setattr(M, "Image", _StubModule, raising=False)
    w, h, thumb = M._decode_image(b"IMGxxxx")
    assert (w, h, thumb) == (128, 64, b"PNGDATA")

    # PIL present but payload unparseable → fake, not an exception
    assert M._decode_image(payload) == fake


def _tiny_png(w: int, h: int) -> bytes:
    """A minimal valid 8-bit RGB PNG built with stdlib only (zlib +
    struct) — no image library needed to CREATE the fixture, so the
    real-codec test below runs the moment Pillow shows up."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes([y % 256, 0, 255 - y % 256] * w) for y in range(h)
    )
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


@pytest.mark.skipif(
    not M.HAVE_PIL,
    reason="Pillow absent in this container; this test covers the real "
           "codec branch automatically wherever Pillow exists",
)
def test_decode_real_codec_with_real_png():
    """The REAL PIL branch end-to-end: a genuine PNG decodes through
    Image.open + thumbnail, not the deterministic fake."""
    png = _tiny_png(300, 200)
    w, h, thumb = M._decode_image(png)
    # thumbnail fits the 128x128 box preserving aspect ratio
    assert w == 128 and 80 <= h <= 90
    assert thumb[:8] == b"\x89PNG\r\n\x1a\n"  # a re-encoded PNG, not payload[:16]
    assert (w, h, thumb) != M._fake_decode(png)


def test_tiny_png_fixture_is_wellformed():
    """The PNG builder itself stays honest (magic, IHDR first, IEND
    last) even while Pillow is absent, so the gated test above starts
    from a valid fixture the day it un-skips."""
    png = _tiny_png(3, 2)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert png[12:16] == b"IHDR"
    assert png[-8:-4] == b"IEND"


def test_multimodal_oracles_byte_addressed_on_non_ascii(spark, tmp_path):
    """Spark's multimodal ops hash/slice UTF-8 BYTES; the DuckDB oracles
    must agree even when text is not ASCII (they address hex pairs, not
    characters). Runs the real harness query + its real oracle over a
    tiny non-ASCII documents table — this is the regression guard for a
    regenerated fixture that gains non-ASCII text."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["héllo wörld — 中文 test", "plain ascii", "naïve café ø"],
            "lang": ["de", "en", "fr"],
            "source": ["src0", "src1", "src2"],
            "n_chars": [22, 11, 12],
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    qs, oracles = entry.queries(), entry.oracle_sql()
    for name in ("q_mm_metadata", "q_mm_thumbnails", "q_mm_frame_sample",
                 "q_mm_fingerprint_dedup"):
        got = {
            tuple(r) for r in qs[name](spark, str(tmp_path)).collect()
        }
        want = {tuple(r) for r in con.sql(oracles[name]).fetchall()}
        assert got == want, name


def test_synth_media_shape(spark):
    docs = spark.createDataFrame([(7, "abc")], "doc_id long, text string")
    m = M.synth_media(docs, "doc_id", "text")
    assert m.columns == ["media_id", "content", "mime"]
    row = m.collect()[0]
    assert bytes(row.content) == b"abc"


def test_lsh_prebucketed_prunes_and_recalls(spark, tmp_path):
    """The ANN scale path: bucketed write -> multi-probe read with real
    partition pruning, recall vs the brute-force baseline."""
    import random

    from linz_bde_uploader_spark.functions import similarity as S

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "emb")
    S.write_bucketed_embeddings(df, path, planes=6, dims=64)

    qvec = [float(x) for x in df.filter("vec_id = 0").first().embedding]
    got = S.lsh_topk_bucketed(spark, path, qvec, k=5, planes=6, probe_radius=1)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [bucket" in plan  # pruning, not a full scan
    res = got.collect()
    assert len(res) == 5
    # the query vector itself must be recalled (it's in its own bucket)
    assert res[0].vec_id == 0 and res[0].score == 1.0

    # the DEFAULT entry point, given the path, takes the same pruned
    # scan (router delegates to the bucketed probe)
    routed = S.lsh_topk(path, qvec, k=5, planes=6, probe_radius=1,
                        spark=spark)
    rplan = routed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [bucket" in rplan
    assert [(r.vec_id, r.score) for r in routed.collect()] == [
        (r.vec_id, r.score) for r in res
    ]

    # a read-back DataFrame that carries the bucket column also probes
    # (no re-hash) and the bucket predicate still prunes partitions
    routed_df = S.lsh_topk(spark.read.parquet(path), qvec, k=5, planes=6,
                           probe_radius=1)
    dplan = routed_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [bucket" in dplan
    assert [(r.vec_id, r.score) for r in routed_df.collect()] == [
        (r.vec_id, r.score) for r in res
    ]

    # a bare DataFrame (no bucket column) falls back to the explicit
    # full-scan API with identical single-bucket results
    full = S.lsh_topk(df, qvec, k=5, planes=6)
    explicit = S.lsh_topk_full_scan(df, qvec, k=5, planes=6)
    assert [tuple(r) for r in full.collect()] == [
        tuple(r) for r in explicit.collect()
    ]
