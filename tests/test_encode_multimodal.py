"""Encoder actor-pool stage + multimodal binary plumbing."""

import numpy as np
import pyarrow as pa
import pytest


def test_encoder_appends_fixed_size_embeddings(ray_session):
    import ray.data
    from coco_search_ray.functions.hashing import hash_embedding
    from coco_search_ray.stages.encode import encode_dataset

    t = pa.table({"doc_id": [1, 2], "text": ["hello", "world"]})
    out = encode_dataset(ray.data.from_arrow(t)).to_pandas().sort_values("doc_id")
    v1 = np.array(out.iloc[0]["embedding"])
    assert v1.shape == (768,)
    assert np.allclose(v1, hash_embedding("hello"))


def test_encoder_context_prefix_changes_embedding_only(ray_session):
    import ray.data
    from coco_search_ray.functions.hashing import hash_embedding
    from coco_search_ray.stages.encode import encode_dataset

    t = pa.table({"text": ["body"], "ctx": ["File: a.py"]})
    out = encode_dataset(ray.data.from_arrow(t), context_col="ctx").to_pandas()
    assert out.iloc[0]["text"] == "body"  # stored text stays raw
    assert np.allclose(np.array(out.iloc[0]["embedding"]), hash_embedding("File: a.py\nbody"))


def test_fake_image_roundtrip():
    from coco_search_ray.stages.multimodal import fake_decode, make_fake_image

    img = fake_decode(make_fake_image(32, 16, 3, seed=1))
    assert img.shape == (16, 32, 3)
    assert np.array_equal(img, fake_decode(make_fake_image(32, 16, 3, seed=1)))


def test_decode_image_stub_raises_without_codec():
    from coco_search_ray.stages.multimodal import decode_image, make_fake_image

    with pytest.raises(NotImplementedError):
        decode_image(make_fake_image(8, 8, 3, seed=0))


def test_wav_codec_cross_validated_against_stdlib():
    """The hand-rolled RIFF chunk walker must agree with the stdlib
    ``wave`` READER on bytes produced by the stdlib WRITER — two
    independent implementations of the same real container format."""
    import io
    import wave as wave_mod

    from coco_search_ray.stages.multimodal import decode_wav, encode_wav

    samples = (np.random.RandomState(7).randn(2048) * 9000).astype(np.int16)
    payload = encode_wav(22050, samples)

    rate, got = decode_wav(payload)
    assert rate == 22050
    assert np.array_equal(got, samples)

    with wave_mod.open(io.BytesIO(payload)) as w:  # stdlib reader agrees
        assert w.getframerate() == rate
        ref = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    assert np.array_equal(got, ref)

    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE" + b"\x00" * 16)


def test_ppm_codec_roundtrip_and_comments():
    from coco_search_ray.stages.multimodal import decode_ppm, encode_ppm

    img = np.random.RandomState(3).randint(0, 256, size=(12, 9, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    # header comments (a real-world P6 wrinkle) are skipped
    raw = b"P6\n# made by hand\n2 1\n255\n" + bytes(range(6))
    got = decode_ppm(raw)
    assert got.shape == (1, 2, 3) and got.ravel().tolist() == list(range(6))
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n2 1\n255\n\x00\x00")


def test_media_values_features_match_numpy(ray_session):
    """media_values: mixed real/fake formats decode, and each row's
    scalar feature equals the independent numpy recomputation from the
    exported raw stream."""
    import ray.data
    from coco_search_ray.stages.multimodal import generate_media_table, media_values

    ds = ray.data.from_arrow(generate_media_table(24, std_formats=True))
    out = media_values(ds).to_pandas().sort_values("media_id")
    assert len(out) == 24
    assert {"wav", "ppm", "img1", "aud1", "vid1"} <= set(out["fmt"])
    for _, r in out.iterrows():
        v = np.asarray(r["vals"], dtype=np.float64)
        want = float(np.sqrt((v**2).mean())) if r["kind"] == "audio" else float(v.mean())
        assert abs(r["feat"] - want) < 1e-9


def test_media_pipeline(ray_session):
    import ray.data
    from coco_search_ray.stages.multimodal import generate_media_table, media_features

    ds = ray.data.from_arrow(generate_media_table(32))
    out = media_features(ds).to_pandas()
    assert len(out) == 32
    assert (out["decode_status"] == "ok").all()
    assert set(out["kind"]) == {"image", "audio", "video"}
    assert len(out.iloc[0]["embedding"]) == 64
    img = out[out["kind"].isin(["image", "video"])]
    assert all(len(m) == 3 for m in img["channel_mean"])
    aud = out[out["kind"] == "audio"]
    assert all(len(m) == 1 for m in aud["channel_mean"])  # [rms]


def test_media_pipeline_skips_bad_payloads(ray_session):
    import ray.data
    from coco_search_ray.stages.multimodal import generate_media_table, media_features

    t = generate_media_table(4)
    bad = pa.table(
        {
            "media_id": pa.array([99], pa.int64()),
            "kind": pa.array(["image"], pa.string()),
            "payload": pa.array([b"garbage"], pa.binary()),
            "width": pa.array([0], pa.int32()),
            "height": pa.array([0], pa.int32()),
        }
    )
    ds = ray.data.from_arrow(pa.concat_tables([t, bad]))
    out = media_features(ds).to_pandas()
    assert (out["decode_status"] == "decode_error").sum() == 1  # skip-and-log, job survives


def test_media_resize_and_frame_sample(ray_session):
    import ray.data
    from coco_search_ray.stages.multimodal import (
        fake_decode,
        generate_media_table,
        iter_fake_video_frames,
        resize_images,
        sample_frames,
    )

    t = generate_media_table(12)
    ds = ray.data.from_arrow(t)

    resized = resize_images(ds, out_w=16, out_h=16).to_pandas()
    img_rows = resized[resized["kind"] == "image"]
    assert (img_rows["width"] == 16).all() and (img_rows["height"] == 16).all()
    shape = fake_decode(img_rows.iloc[0]["payload"]).shape
    assert shape == (16, 16, 3)
    # non-image payloads pass through untouched
    aud = resized[resized["kind"] == "audio"].iloc[0]
    orig = t.to_pandas()
    assert aud["payload"] == orig[orig["media_id"] == aud["media_id"]].iloc[0]["payload"]

    frames = sample_frames(ds, stride=2).to_pandas()
    assert (frames["frame_idx"] % 2 == 0).all()
    # every sampled frame decodes as a standalone image
    assert fake_decode(frames.iloc[0]["payload"]).ndim == 3
    vids = orig[orig["kind"] == "video"]
    expect = sum(
        len(list(iter_fake_video_frames(p))[::2]) for p in vids["payload"]
    )
    assert len(frames) == expect

def test_resize_handles_mixed_container_formats(ray_session):
    """resize_images over the std_formats table (PPM interleaved with
    IMG1 — the same input q_media_features uses): every image row must
    resize regardless of container, mirroring MediaDecodeActor's sniff
    dispatch (a fake-only decode asserted on the PPM rows)."""
    import ray.data
    from coco_search_ray.stages.multimodal import (
        fake_decode,
        generate_media_table,
        resize_images,
        sniff_format,
    )

    t = generate_media_table(24, std_formats=True)
    kinds = t["kind"].to_pylist()
    fmts = {sniff_format(p.as_py()) for p, k in zip(t["payload"], kinds) if k == "image"}
    assert fmts == {"ppm", "img1"}  # the mix is real or the test is vacuous

    resized = resize_images(ray.data.from_arrow(t), out_w=8, out_h=8).to_pandas()
    img = resized[resized["kind"] == "image"]
    assert (img["width"] == 8).all() and (img["height"] == 8).all()
    for p in img["payload"]:
        assert fake_decode(p).shape == (8, 8, 3)  # re-encoded IMG1 either way


def test_extract_json_field_empty_batch_keeps_sql_type(ray_session):
    """The appended column's type on an EMPTY batch must match the
    non-empty blocks for ANY sql_type (the old hand-mapped empty array
    only covered BIGINT/DOUBLE: a VARCHAR extraction produced float64
    on empty blocks and string elsewhere — a block-schema divergence)."""
    import pyarrow as pa
    from coco_search_ray.stages.jsonops import extract_json_field

    strs = pa.table({"props": pa.array(['{"k": "a"}', "{}"], pa.string())})
    nums = pa.table({"props": pa.array(['{"k": 3}', "{}"], pa.string())})
    for full, sql_type, want in [(strs, "VARCHAR", pa.string()),
                                 (nums, "BIGINT", pa.int64()),
                                 (nums, "DOUBLE", pa.float64())]:
        got_full = extract_json_field(full, "props", "k", "v", sql_type)
        got_empty = extract_json_field(full.slice(0, 0), "props", "k", "v", sql_type)
        assert got_full.schema.field("v").type == want
        assert got_empty.schema.field("v").type == want
    out = extract_json_field(strs, "props", "k", "v", "VARCHAR")
    assert out["v"].to_pylist() == ['"a"', None]
