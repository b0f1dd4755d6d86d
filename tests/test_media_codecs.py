"""Real pure-numpy media codecs (PPM / WAV): round-trip identity, resize
correctness, header-error paths, and the actor-pool decode pipelines."""

import numpy as np
import pytest

from hepdata_validator_ray.pipelines.media_codecs import (
    MediaDecodeError,
    PARSE_ERROR,
    decode_ppm,
    decode_wav_pcm16,
    encode_ppm,
    encode_wav_pcm16,
    ppm_features,
    resample_decimate,
    resize_nearest,
    synth_pixels,
    synth_samples,
    wav_features,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_ppm_round_trip_identity():
    px = synth_pixels(42, 11, 7)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)


def test_ppm_header_errors():
    for blob in (b"P5\n2 2\n255\n" + b"\x00" * 12,          # wrong magic
                 b"P6\n2 2\n100\n" + b"\x00" * 12,          # wrong maxval
                 b"P6\n2 2\n255\n" + b"\x00" * 5,           # truncated pixels
                 b"P6\nx 2\n255\n" + b"\x00" * 12):         # non-numeric field
        with pytest.raises(MediaDecodeError, match="problem parsing"):
            decode_ppm(blob)
    assert PARSE_ERROR == "There was a problem parsing the file.\n"


def test_resize_nearest_exact_small_case():
    # 2x2 checkerboard upsampled 2x: each source pixel becomes a 2x2 block
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    px[0, 1] = px[1, 0] = 255
    up = resize_nearest(px, 4, 4)
    assert up.shape == (4, 4, 3)
    assert np.array_equal(up[:2, :2], np.broadcast_to(px[0, 0], (2, 2, 3)))
    assert np.array_equal(up[:2, 2:], np.broadcast_to(px[0, 1], (2, 2, 3)))
    # downsample back recovers the original (pixel-center sampling)
    assert np.array_equal(resize_nearest(up, 2, 2), px)


def test_ppm_features_uniform_image():
    px = np.full((4, 6, 3), 100, dtype=np.uint8)
    f = ppm_features(px)
    assert (f["height"], f["width"]) == (4, 6)
    assert f["mean_r"] == f["mean_g"] == f["mean_b"] == 100.0
    assert f["luma_hist"].sum() == 24 and f["luma_hist"][100 // 16] == 24


def test_wav_round_trip_and_features():
    s = synth_samples(7, 1000)
    blob = encode_wav_pcm16(s, 8000)
    out, sr = decode_wav_pcm16(blob)
    assert sr == 8000 and np.array_equal(out, s)
    f = wav_features(out, sr)
    assert f["n_samples"] == 1000 and f["duration_s"] == 0.125
    assert 0 < f["rms"] <= f["peak"] <= 1.0
    assert np.array_equal(resample_decimate(out, 4), s[::4])


def test_wav_header_errors():
    good = encode_wav_pcm16(synth_samples(1, 10), 8000)
    for blob in (b"RIFX" + good[4:],           # wrong magic
                 good[:20] + b"\x02" + good[21:],  # non-PCM format code
                 good[:-4]):                   # truncated data
        with pytest.raises(MediaDecodeError):
            decode_wav_pcm16(blob)


def test_image_pipeline_real_decode():
    from hepdata_validator_ray.pipelines.multimodal import image_features

    df = image_features(DOCS).to_pandas()
    assert len(df) == 500
    assert df.ok.all()
    assert (df.height >= 4).all() and (df.width >= 4).all()
    # feature values match a direct local decode for one doc
    from hepdata_validator_ray.pipelines.media_codecs import ppm_features as pf

    row = df.iloc[0]
    px = synth_pixels(int(row.doc_id), int(row.height), int(row.width))
    f = pf(px)
    assert abs(f["mean_r"] - row.mean_r) < 1e-9
    assert f["luma_hist"].tolist() == list(row.luma_hist)


def test_image_resize_pipeline():
    from hepdata_validator_ray.pipelines.multimodal import image_resized

    df = image_resized(DOCS, out_h=8, out_w=8).to_pandas()
    assert len(df) == 500
    # every output is a valid 8x8 PPM: header + 192 pixel bytes
    assert (df.n_bytes == len(b"P6\n8 8\n255\n") + 8 * 8 * 3).all()
    px = decode_ppm(df.payload.iloc[0])
    assert px.shape == (8, 8, 3)


def test_audio_pipeline_real_decode():
    from hepdata_validator_ray.pipelines.multimodal import audio_features

    df = audio_features(DOCS).to_pandas()
    assert len(df) == 500 and df.ok.all()
    assert (df.sample_rate == 16000).all()
    assert ((df.n_samples >= 64) & (df.n_samples < 64 + 512)).all()


def test_corrupt_payload_becomes_error_row():
    import pyarrow as pa

    from hepdata_validator_ray.pipelines.multimodal import ImageDecodeStage

    t = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                  "payload": pa.array([encode_ppm(synth_pixels(1, 4, 4)), b"JUNK"], type=pa.binary())})
    out = ImageDecodeStage()(t).to_pandas()
    assert out.ok.tolist() == [True, False]
    assert out.error.iloc[1] == PARSE_ERROR
