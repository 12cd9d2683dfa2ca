"""Multimodal column plumbing (image/audio as opaque binary + metadata).

The container has no image/audio codecs, so the DECODE step is stubbed
(clearly marked); everything Ray-side — schema, actor-pool stage shape,
batch sizing, output layout — is real and tested.  Swap ``_decode_stub``
for PIL/libsndfile in production.

Binary payload batches are large: callers should use a small ``batch_size``
and ``batch_format="pyarrow"`` (binary columns don't round-trip pandas
cleanly).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.large_binary()),
        ("mime", pa.string()),
    ]
)


def _decode_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB decoder: derives deterministic fake (width, height, channels)
    from the payload header bytes.  A real build calls the codec here.
    """
    if len(payload) < 4:
        raise ValueError("payload too short to decode")
    w = 16 + payload[0] % 240
    h = 16 + payload[1] % 240
    c = 1 + payload[2] % 3
    return w, h, c


def real_decode(payload: bytes):
    """Placeholder for the actual codec — not available in this container."""
    raise NotImplementedError(
        "image/audio codecs are not installed in this environment; "
        "use the deterministic _decode_stub for plumbing tests"
    )


class DecodeMedia:
    """Actor-pool map_batches stage: decode + feature-extract binary media.

    Use: ds.map_batches(DecodeMedia, concurrency=N, batch_size=64,
                        num_cpus=1, batch_format="pyarrow")
    __init__ is where a real build loads the codec/model ONCE per actor.
    """

    def __init__(self):
        self.decode = _decode_stub  # real codec load goes here

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n = len(payloads)
        ws = np.zeros(n, np.int32)
        hs = np.zeros(n, np.int32)
        cs = np.zeros(n, np.int32)
        nbytes = np.zeros(n, np.int64)
        feat = np.zeros(n, np.float64)
        ok = np.zeros(n, np.bool_)
        for i, p in enumerate(payloads):
            nbytes[i] = len(p)
            try:
                ws[i], hs[i], cs[i] = self.decode(p)
                # "feature": byte-mean — stands in for the model embedding
                feat[i] = float(np.frombuffer(p, dtype=np.uint8).mean())
                ok[i] = True
            except (ValueError, NotImplementedError):
                ok[i] = False
        return pa.table(
            {
                "media_id": batch["media_id"],
                "width": pa.array(ws),
                "height": pa.array(hs),
                "channels": pa.array(cs),
                "n_bytes": pa.array(nbytes),
                "byte_mean": pa.array(feat),
                "decoded": pa.array(ok),
            }
        )


def synth_media_ds(sf_dir: str):
    """Deterministic fake media table derived from documents (payload =
    utf-8 bytes of the text) so the stage is drivable on testdata."""
    import os

    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def to_media(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": t["doc_id"],
                "payload": pa.array(
                    [x.encode("utf-8") for x in t["text"].to_pylist()],
                    pa.large_binary(),
                ),
                "mime": pa.array(["application/fake"] * t.num_rows, pa.string()),
            }
        )

    return ds.map_batches(to_media, batch_format="pyarrow")
