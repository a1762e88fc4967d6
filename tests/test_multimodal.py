"""Multimodal plumbing: schema, magic sniffing, stubbed vs fake decode."""

from frogocr_spark.operators import multimodal, textstats


def test_magic_sniff():
    assert multimodal.sniff_magic(b"\x89PNGxxxx") == "png"
    assert multimodal.sniff_magic(b"\xff\xd8\xff\xe0") == "jpeg"
    assert multimodal.sniff_magic(b"RIFF1234WAVE") == "wav"
    assert multimodal.sniff_magic(b"????") == "unknown"


def test_attach_and_decode_fake(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta"), (2, "epsilon")],
        "doc_id long, text string")
    blobs = multimodal.attach_binary_payload(df)
    feats = multimodal.decode_features(blobs, fake_decode=True, dim=8).collect()
    by_id = {r.doc_id: r for r in feats}
    assert by_id[0].media_type == "png"
    assert by_id[1].media_type == "jpeg"
    assert by_id[2].media_type == "wav"
    for r in feats:
        assert r.decode_error is None
        assert len(r.feature) == 8
        assert all(0.0 <= x <= 1.0 for x in r.feature)
        assert r.n_bytes > 4
    # deterministic
    again = multimodal.decode_features(blobs, fake_decode=True, dim=8).collect()
    assert sorted(map(str, feats)) == sorted(map(str, again))


def test_decode_real_is_stubbed(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    blobs = multimodal.attach_binary_payload(df)
    rows = multimodal.decode_features(blobs, fake_decode=False).collect()
    assert rows[0].feature is None
    assert "not installed" in rows[0].decode_error


def test_textstats_columns(spark):
    df = spark.createDataFrame(
        [(0, "the cat sat on the mat and it is fine"),
         (1, "og det er som på til av i med for"),
         (2, ""), (3, "zzz qqq")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in textstats.with_textstats(df).collect()}
    assert got[0].lang_id == "en"
    assert got[1].lang_id == "no"
    assert got[2].lang_id == "xx" and got[2].n_tokens == 0
    assert got[3].lang_id == "xx"
    assert got[0].n_tokens == 10
    assert 0.0 <= got[0].quality <= 1.0
    assert len(got[0].fingerprint) == 32
    # fingerprint is whitespace/case-insensitive
    df2 = spark.createDataFrame(
        [(0, "THE  cat   sat on the mat and it is fine")], "doc_id long, text string")
    fp2 = textstats.with_textstats(df2).first().fingerprint
    assert fp2 == got[0].fingerprint


# ---------------------------------------------------------------------------
# resize + frame-sample plumbing (decode stubbed, math real)
# ---------------------------------------------------------------------------

import numpy as np
import pytest

from frogocr_spark.operators.multimodal import (_decode_fake_image,
                                                _resize_nearest,
                                                resize_images, sample_frames)


@pytest.fixture(scope="module")
def docs_with_payload(spark):
    df = spark.createDataFrame(
        [(i, f"document number {i} with some text") for i in range(12)],
        "doc_id long, text string")
    return multimodal.attach_binary_payload(df).cache()


def test_resize_nearest_known_values():
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    out = _resize_nearest(img, 2, 2)
    # nearest-neighbor with floor mapping picks rows/cols 0 and 2
    assert out.shape == (2, 2, 3)
    assert (out == img[[0, 2]][:, [0, 2]]).all()
    # upscale repeats pixels, never interpolates
    up = _resize_nearest(img, 8, 8)
    assert up.shape == (8, 8, 3)
    assert set(np.unique(up)) <= set(np.unique(img))


def test_resize_images_plumbing(spark, docs_with_payload):
    out = resize_images(docs_with_payload, 4, 4, fake_decode=True).collect()
    by_media = {}
    for r in out:
        by_media.setdefault(r.media_type, []).append(r)
    # images resized: 4*4*3 raw bytes, dims recorded
    for r in by_media["png"] + by_media["jpeg"]:
        assert (r.src_w, r.src_h, r.out_w, r.out_h) == (16, 16, 4, 4)
        assert len(r.pixels) == 4 * 4 * 3
        assert r.decode_error is None
    # non-images error cleanly, 1 row in = 1 row out
    for r in by_media["wav"]:
        assert r.pixels is None and "not an image" in r.decode_error
    assert len(out) == docs_with_payload.count()


def test_resize_images_real_decode_stub_surfaces_error(spark,
                                                       docs_with_payload):
    out = resize_images(docs_with_payload, 4, 4, fake_decode=False).collect()
    imgs = [r for r in out if r.media_type in ("png", "jpeg")]
    assert imgs and all("requires PIL" in r.decode_error for r in imgs)


def test_sample_frames_udtf_shape(spark, docs_with_payload):
    k = 5
    out = sample_frames(docs_with_payload, k=k, fake_decode=True).collect()
    rows_per_doc = {}
    for r in out:
        rows_per_doc.setdefault(r.doc_id, []).append(r)
    assert len(rows_per_doc) == docs_with_payload.count()
    for doc_id, rows in rows_per_doc.items():
        assert 1 <= len(rows) <= k          # 1 row in -> <=k rows out
        assert len(rows) == min(k, rows[0].n_frames)
        idxs = [r.frame_idx for r in rows]
        assert idxs == sorted(set(idxs))    # evenly spaced, deduped
        assert all(0 <= i < rows[0].n_frames for i in idxs)
        assert all(r.ts_ms == r.frame_idx * 1000 // 30 for r in rows)
        assert all(len(r.feature) == 8 for r in rows)


def test_sample_frames_deterministic(spark, docs_with_payload):
    a = sample_frames(docs_with_payload, k=3, fake_decode=True).collect()
    b = sample_frames(docs_with_payload, k=3, fake_decode=True).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
