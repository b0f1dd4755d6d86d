"""Multimodal-column plumbing: opaque binary payloads with typed metadata.

The container has no image/audio codecs, so the *decode* kernel is stubbed
(deterministic fake features, or NotImplementedError in strict mode) — but
the Ray-side plumbing is real and tested: binary column schema, actor-pool
decode stage with per-actor init, byte-aware small batches, stable output
layout.  Swapping ``_fake_decode`` for a real PIL/ffmpeg call is the only
change needed on a cluster with codecs installed."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def payload_table(docs_path: str) -> "ray.data.Dataset":
    """Materialize an opaque-binary payload column (utf-8 bytes of text as a
    stand-in blob) + typed metadata — the multimodal input shape."""

    def fn(t: pa.Table) -> pa.Table:
        # null text → empty payload (null-tolerant, matching text.py's
        # empty-doc convention) rather than crashing the payload build
        blobs = pa.array(
            [s.encode() if s is not None else b"" for s in t["text"].to_pylist()],
            type=pa.binary(),
        )
        return pa.Table.from_arrays(
            [t["doc_id"], blobs, pa.compute.binary_length(blobs), pa.array(["text/plain"] * t.num_rows)],
            names=["doc_id", "payload", "n_bytes", "media_type"],
        )

    return ray.data.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", batch_size=1024
    )


class DecodeStage:
    """Actor-pool decode/feature-extract stage.

    ``strict=True`` raises NotImplementedError (no codecs in this container);
    default mode computes a deterministic fake feature: 16-bin byte histogram
    — exercising the exact batch/actor/schema path a real decoder would."""

    def __init__(self, strict: bool = False, n_bins: int = 16):
        self.strict = strict
        self.n_bins = n_bins

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "media decode requires image/audio codecs not present in this container"
            )
        feats = []
        for blob in t["payload"].to_pylist():
            arr = np.frombuffer(blob, dtype=np.uint8)
            hist = np.bincount(arr // (256 // self.n_bins), minlength=self.n_bins).astype(np.int64)
            feats.append(hist.tolist())
        return pa.Table.from_arrays(
            [t["doc_id"], t["n_bytes"], pa.array(feats, type=pa.list_(pa.int64()))],
            names=["doc_id", "n_bytes", "byte_hist"],
        )


class ResizeStage:
    """Image-resize plumbing stub: real impl would decode + PIL.resize; the
    deterministic fake truncates/pads the byte payload to ``target_bytes``
    — exercising the byte-aware batch sizing and schema contract."""

    def __init__(self, target_bytes: int = 64, strict: bool = False):
        self.target = target_bytes
        self.strict = strict

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("image resize requires codecs not present in this container")
        resized = []
        for blob in t["payload"].to_pylist():
            b = blob[: self.target]
            resized.append(b + b"\x00" * (self.target - len(b)))
        out = pa.array(resized, type=pa.binary())
        return pa.Table.from_arrays(
            [t["doc_id"], out, pa.compute.binary_length(out)],
            names=["doc_id", "payload", "n_bytes"],
        )


class FrameSampleStage:
    """Video frame-sampling plumbing stub: real impl would ffmpeg-seek; the
    deterministic fake takes every k-th ``frame_bytes`` window of the blob,
    emitting one row per sampled frame (flat_map shape: 1 row in → N out)."""

    def __init__(self, frame_bytes: int = 32, every_k: int = 4, max_frames: int = 8):
        self.frame_bytes = frame_bytes
        self.every_k = every_k
        self.max_frames = max_frames

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, frames, idxs = [], [], []
        for doc_id, blob in zip(t["doc_id"].to_pylist(), t["payload"].to_pylist()):
            n_frames = max(1, len(blob) // self.frame_bytes)
            for j, fi in enumerate(range(0, n_frames, self.every_k)):
                if j >= self.max_frames:
                    break
                ids.append(doc_id)
                idxs.append(fi)
                frames.append(blob[fi * self.frame_bytes : (fi + 1) * self.frame_bytes])
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids),
                "frame_idx": pa.array(idxs, type=pa.int32()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )


def resized_payloads(docs_path: str, concurrency: int = 2) -> "ray.data.Dataset":
    return payload_table(docs_path).map_batches(
        ResizeStage, batch_format="pyarrow", batch_size=256, concurrency=(1, concurrency)
    )


def sampled_frames(docs_path: str, concurrency: int = 2) -> "ray.data.Dataset":
    return payload_table(docs_path).map_batches(
        FrameSampleStage, batch_format="pyarrow", batch_size=256, concurrency=(1, concurrency)
    )


def payload_meta(docs_path: str) -> "ray.data.Dataset":
    """(doc_id, n_bytes) — the oracle-checkable metadata projection."""
    return payload_table(docs_path).select_columns(["doc_id", "n_bytes"])


def byte_histogram_rows(docs_path: str, concurrency: int = 2) -> "ray.data.Dataset":
    """The decode stage's features as oracle-checkable rows: one
    (doc_id, bin, n) row per NON-ZERO 16-bin byte-histogram bucket — the
    flat projection of ``decoded_features`` that a SQL engine can reproduce
    (documents are ASCII, so bytes ≡ code points)."""

    def explode(t: pa.Table) -> pa.Table:
        ids, bins, ns = [], [], []
        for doc_id, hist in zip(t["doc_id"].to_pylist(), t["byte_hist"].to_pylist()):
            for b, n in enumerate(hist):
                if n:
                    ids.append(doc_id)
                    bins.append(b)
                    ns.append(n)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "bin": pa.array(bins, type=pa.int64()),
                "n": pa.array(ns, type=pa.int64()),
            }
        )

    return decoded_features(docs_path, concurrency=concurrency).map_batches(
        explode, batch_format="pyarrow"
    )


def decoded_features(docs_path: str, concurrency: int = 2, strict: bool = False) -> "ray.data.Dataset":
    # small batch_size: binary payload batches sized by bytes, not rows
    return payload_table(docs_path).map_batches(
        DecodeStage,
        fn_constructor_kwargs=dict(strict=strict),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, concurrency),
    )


# ---------------------------------------------------------------------------
# REAL codec path — PPM images and WAV audio decoded with numpy alone
# (pipelines/media_codecs.py).  JPEG/MP4 remain behind the strict-mode stub
# above; these stages are the genuine decode → feature → resize pipeline the
# stub was standing in for.
# ---------------------------------------------------------------------------

def image_payload_table(docs_path: str, max_side: int = 24) -> "ray.data.Dataset":
    """Deterministic REAL image corpus: each doc becomes a binary PPM (P6)
    blob whose pixels derive from the doc id (splitmix64 stream) and whose
    dimensions derive from the text length — reproducible without media
    files on disk.  Schema: (doc_id, payload, n_bytes, media_type)."""
    from hepdata_validator_ray.pipelines.media_codecs import encode_ppm, synth_pixels

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        lens = pa.compute.utf8_length(t["text"]).to_pylist()
        blobs = []
        for doc_id, n in zip(ids, lens):
            h = 4 + (n or 0) % (max_side - 4)
            w = 4 + ((n or 0) * 7) % (max_side - 4)
            blobs.append(encode_ppm(synth_pixels(int(doc_id or 0), h, w)))
        arr = pa.array(blobs, type=pa.binary())
        return pa.Table.from_arrays(
            [t["doc_id"], arr, pa.compute.binary_length(arr),
             pa.array(["image/x-portable-pixmap"] * t.num_rows)],
            names=["doc_id", "payload", "n_bytes", "media_type"],
        )

    return ray.data.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", batch_size=1024
    )


class ImageDecodeStage:
    """REAL actor-pool image decode: parse the PPM header, reshape the pixel
    buffer, compute per-channel means + a 16-bin luminance histogram.
    Malformed payloads become error rows (ok=False, reference parse-error
    message) instead of crashing the task — violations-as-data (ST2)."""

    def __init__(self, n_bins: int = 16):
        from hepdata_validator_ray.pipelines import media_codecs as mc

        self.mc = mc
        self.n_bins = n_bins

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = {k: [] for k in ("doc_id", "ok", "error", "height", "width",
                                "mean_r", "mean_g", "mean_b", "luma_hist")}
        for doc_id, blob in zip(t["doc_id"].to_pylist(), t["payload"].to_pylist()):
            rows["doc_id"].append(doc_id)
            try:
                f = self.mc.ppm_features(self.mc.decode_ppm(blob), self.n_bins)
                rows["ok"].append(True)
                rows["error"].append(None)
                for k in ("height", "width", "mean_r", "mean_g", "mean_b"):
                    rows[k].append(f[k])
                rows["luma_hist"].append(f["luma_hist"].tolist())
            except self.mc.MediaDecodeError as e:
                rows["ok"].append(False)
                rows["error"].append(str(e))
                for k in ("height", "width", "mean_r", "mean_g", "mean_b", "luma_hist"):
                    rows[k].append(None)
        return pa.Table.from_pydict(
            rows,
            schema=pa.schema(
                [("doc_id", pa.int64()), ("ok", pa.bool_()), ("error", pa.string()),
                 ("height", pa.int64()), ("width", pa.int64()),
                 ("mean_r", pa.float64()), ("mean_g", pa.float64()), ("mean_b", pa.float64()),
                 ("luma_hist", pa.list_(pa.int64()))]
            ),
        )


class ImageResizeStage:
    """REAL resize: decode PPM → nearest-neighbor gather → re-encode PPM."""

    def __init__(self, out_h: int = 8, out_w: int = 8):
        from hepdata_validator_ray.pipelines import media_codecs as mc

        self.mc = mc
        self.out_h, self.out_w = out_h, out_w

    def __call__(self, t: pa.Table) -> pa.Table:
        blobs = []
        for blob in t["payload"].to_pylist():
            px = self.mc.resize_nearest(self.mc.decode_ppm(blob), self.out_h, self.out_w)
            blobs.append(self.mc.encode_ppm(px))
        out = pa.array(blobs, type=pa.binary())
        return pa.Table.from_arrays(
            [t["doc_id"], out, pa.compute.binary_length(out)],
            names=["doc_id", "payload", "n_bytes"],
        )


def image_features(docs_path: str, concurrency: int = 2) -> "ray.data.Dataset":
    return image_payload_table(docs_path).map_batches(
        ImageDecodeStage, batch_format="pyarrow", batch_size=256, concurrency=(1, concurrency)
    )


def image_resized(docs_path: str, out_h: int = 8, out_w: int = 8, concurrency: int = 2) -> "ray.data.Dataset":
    return image_payload_table(docs_path).map_batches(
        ImageResizeStage,
        fn_constructor_kwargs=dict(out_h=out_h, out_w=out_w),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, concurrency),
    )


def audio_payload_table(docs_path: str, sample_rate: int = 16000) -> "ray.data.Dataset":
    """Deterministic REAL audio corpus: each doc becomes a RIFF/WAVE PCM16
    blob (samples seeded from the doc id, length from the text length)."""
    from hepdata_validator_ray.pipelines.media_codecs import encode_wav_pcm16, synth_samples

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        lens = pa.compute.utf8_length(t["text"]).to_pylist()
        blobs = [
            encode_wav_pcm16(synth_samples(int(i or 0), 64 + ((n or 0) * 13) % 512), sample_rate)
            for i, n in zip(ids, lens)
        ]
        arr = pa.array(blobs, type=pa.binary())
        return pa.Table.from_arrays(
            [t["doc_id"], arr, pa.compute.binary_length(arr), pa.array(["audio/wav"] * t.num_rows)],
            names=["doc_id", "payload", "n_bytes", "media_type"],
        )

    return ray.data.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", batch_size=1024
    )


class AudioDecodeStage:
    """REAL actor-pool audio decode: RIFF header validation + PCM16 frame
    view; features are duration/RMS/peak/zero-crossing rate."""

    def __init__(self):
        from hepdata_validator_ray.pipelines import media_codecs as mc

        self.mc = mc

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = {k: [] for k in ("doc_id", "ok", "error", "n_samples", "sample_rate",
                                "duration_s", "rms", "peak", "zero_crossings")}
        for doc_id, blob in zip(t["doc_id"].to_pylist(), t["payload"].to_pylist()):
            rows["doc_id"].append(doc_id)
            try:
                samples, sr = self.mc.decode_wav_pcm16(blob)
                f = self.mc.wav_features(samples, sr)
                rows["ok"].append(True)
                rows["error"].append(None)
                for k in ("n_samples", "sample_rate", "duration_s", "rms", "peak", "zero_crossings"):
                    rows[k].append(f[k])
            except self.mc.MediaDecodeError as e:
                rows["ok"].append(False)
                rows["error"].append(str(e))
                for k in ("n_samples", "sample_rate", "duration_s", "rms", "peak", "zero_crossings"):
                    rows[k].append(None)
        return pa.Table.from_pydict(
            rows,
            schema=pa.schema(
                [("doc_id", pa.int64()), ("ok", pa.bool_()), ("error", pa.string()),
                 ("n_samples", pa.int64()), ("sample_rate", pa.int64()),
                 ("duration_s", pa.float64()), ("rms", pa.float64()), ("peak", pa.float64()),
                 ("zero_crossings", pa.int64())]
            ),
        )


def audio_features(docs_path: str, concurrency: int = 2) -> "ray.data.Dataset":
    return audio_payload_table(docs_path).map_batches(
        AudioDecodeStage, batch_format="pyarrow", batch_size=256, concurrency=(1, concurrency)
    )
