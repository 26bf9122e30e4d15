"""Multimodal column stages: real plumbing, gated codecs."""
import numpy as np
import pyarrow as pa
import pytest

from ctdray.fixtures import make_corpus, make_media_ref
from ctdray.stages.multimodal import (AUDIO_FEAT_SCHEMA, FRAME_SCHEMA,
                                      THUMB_SCHEMA, audio_features_task,
                                      decode_image, sample_frames_task,
                                      thumbnails_task)


def _page_batch(n=4):
    refs = [make_media_ref(f"doc-{i:08d}", 0) for i in range(n)]
    return pa.table({"media_ref": pa.array(refs)})


def test_decode_image_pgm_and_gate():
    ref = make_media_ref("doc-00000000", 0)
    from ctdray.sources.media import fetch_media

    img = decode_image(fetch_media(ref))
    assert img.dtype == np.uint8 and img.ndim == 2
    with pytest.raises((NotImplementedError, ValueError)):
        decode_image(b"\x89PNG\r\n\x1a\nxxxx")


def test_thumbnails_shapes_and_poison_pill():
    batch = _page_batch(3)
    bad = pa.table({"media_ref": pa.array(["bogus://x"])})
    out = thumbnails_task(pa.concat_tables([batch, bad]), size=32)
    assert out.schema.equals(THUMB_SCHEMA)
    df = out.to_pandas()
    ok = df[df.decode_ok]
    assert len(ok) == 3 and (~df.decode_ok).sum() == 1
    t = np.frombuffer(ok.iloc[0]["thumb"], np.uint8).reshape(32, 32)
    assert t.mean() > 0
    # deterministic
    out2 = thumbnails_task(batch, size=32)
    assert out2.to_pandas().iloc[0]["thumb"] == ok.iloc[0]["thumb"]


def test_frame_sampling_layout():
    out = sample_frames_task(_page_batch(2), n_frames=3)
    assert out.schema.equals(FRAME_SCHEMA)
    df = out.to_pandas()
    assert len(df) == 6
    assert sorted(df[df.media_ref == df.media_ref[0]].frame_idx) == [0, 1, 2]
    f = np.frombuffer(df.iloc[0]["frame"], np.uint8)
    assert f.size == df.iloc[0]["frame_h"] * df.iloc[0]["frame_w"]
    # deterministic across calls
    again = sample_frames_task(_page_batch(2), n_frames=3).to_pandas()
    assert again.iloc[0]["frame"] == df.iloc[0]["frame"]


def test_audio_features_layout():
    out = audio_features_task(_page_batch(2), n_windows=4, n_mel=3)
    assert out.schema.equals(AUDIO_FEAT_SCHEMA)
    df = out.to_pandas()
    assert all(len(f) == 12 for f in df["features"])


def test_thumbnails_distributed(ray_session):
    import ray.data as rd

    from ctdray.stages.explode import explode_media_spans

    docs = rd.from_arrow(make_corpus(6))
    pages = docs.map_batches(explode_media_spans, batch_format="pyarrow")
    thumbs = pages.map_batches(thumbnails_task, batch_format="pyarrow",
                               batch_size=8).to_pandas()
    assert len(thumbs) > 0 and thumbs.decode_ok.all()
