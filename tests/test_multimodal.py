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
