"""Multimodal plumbing: binary payloads, Arrow-batched decode stubs,
frame-sampling expansion (operators/multimodal.py)."""

import hashlib

import pytest

from oak_knowledge_graph_neo4j_auradb_spark.operators.multimodal import (
    decode_media,
    fetch_payload,
    sample_frames,
)
from oak_knowledge_graph_neo4j_auradb_spark.operators.reconstruct import media_assets
from oak_knowledge_graph_neo4j_auradb_spark.sources.docgen import (
    make_universe,
    universe_to_arrow,
)


@pytest.fixture(scope="module")
def assets(spark, tmp_path_factory):
    import pyarrow.parquet as pq

    p = str(tmp_path_factory.mktemp("docs") / "d.parquet")
    pq.write_table(universe_to_arrow(make_universe(60)), p)
    return media_assets(spark.read.parquet(p))


def test_payload_is_binary_and_deterministic(assets):
    row = fetch_payload(assets).first()
    assert isinstance(row["payload"], bytearray | bytes)
    assert bytes(row["payload"]) == row["media_ref"].encode("utf-8")


def test_decode_stub_features(assets):
    feats = decode_media(fetch_payload(assets))
    row = feats.first()
    h = hashlib.md5(row["media_ref"].encode()).hexdigest()
    assert row["content_md5"] == h
    assert row["n_bytes"] == len(row["media_ref"])
    assert 0 <= row["width"] < 1920 and 0 <= row["height"] < 1080


def test_real_decode_is_stubbed(assets):
    with pytest.raises(Exception, match="NotImplementedError|not present"):
        decode_media(fetch_payload(assets), stub=False).first()


def test_frame_sampling_expands_rows(assets):
    vids = assets.filter("field = 'lesson_video_id'")
    n_vids = vids.count()
    frames = sample_frames(fetch_payload(vids), n_frames=3)
    assert frames.count() == 3 * n_vids
    one = frames.filter("frame_idx = 1").first()
    want = hashlib.md5(one["media_ref"].encode() + b"1").hexdigest()
    assert one["frame_md5"] == want


def test_embed_media_deterministic(assets):
    from oak_knowledge_graph_neo4j_auradb_spark.operators.multimodal import (
        EMBED_DIM,
        embed_media,
    )

    emb = embed_media(fetch_payload(assets))
    row = emb.first()
    v = row["embedding"]
    assert len(v) == EMBED_DIM
    assert all(-0.5 <= x <= 0.5 for x in v)
    digest = hashlib.md5(row["media_ref"].encode()).digest()
    assert v == [b / 255.0 - 0.5 for b in digest[:EMBED_DIM]]
    # same ref -> identical embedding on re-run (pure function of bytes)
    again = embed_media(fetch_payload(assets)).first()
    assert again["embedding"] == v or again["media_ref"] != row["media_ref"]
