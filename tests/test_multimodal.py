"""Multimodal binary-column operators: metadata, fingerprint dedup,
mapInPandas decode plumbing, frame sampling, NULL payloads."""

from __future__ import annotations

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
