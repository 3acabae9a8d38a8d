"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

This extends the engine beyond the reference's text-only surface (a core
training-data-pipeline need).  The DESIGN is fully real and tested —
schema convention, partition-preserving batch processing, UDF signatures,
batch shapes, feature vector layout.  The actual media CODECS are not
available in this environment, so the decode kernel is a clearly-marked
deterministic fake (``_STUB_DECODERS``); swapping in Pillow/librosa/pyav is
a one-function change per modality (see ``register_decoder``).

Schema convention
-----------------
    content   binary                 -- the raw media bytes (opaque)
    modality  string                 -- 'image' | 'audio' | 'video' | 'text'
    meta      map<string,string>     -- typed per-modality metadata
                                        (width/height, sample_rate/duration_ms,
                                         fps/n_frames, mime, ...)

Scale notes
-----------
 - Binary payloads ride Arrow record batches driver-free; keep
   ``spark.sql.execution.arrow.maxRecordsPerBatch`` modest (default 10k)
   when payloads are MB-sized so a batch fits executor memory.
 - ``mapInPandas`` is partition-preserving: no shuffle is introduced by any
   stage here.  Co-locate expensive decodes with downstream consumers by
   partitioning on the storage key BEFORE decoding.
 - At 100 TB, media bytes should stay OUT of shuffles: extract features
   early, project the binary away, and join features (small) instead of
   payloads (huge).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Decode kernels.  A decoder takes (payload_bytes, meta_dict) and returns a
# dict of outputs.  Real codec libraries are not installed in this
# environment; these deterministic fakes keep every byte of the Spark
# plumbing testable.  Swap via register_decoder("image", fn).
# ---------------------------------------------------------------------------
def _stable_floats(data: bytes, n: int, salt: str) -> list[float]:
    """Deterministic pseudo-features: n floats in [0, 1) derived from a
    rolling sha256 of the payload — stable across processes/partitions."""
    out: list[float] = []
    h = hashlib.sha256(salt.encode() + (data or b"")).digest()
    while len(out) < n:
        for i in range(0, len(h) - 3, 4):
            out.append(int.from_bytes(h[i : i + 4], "big") / 2**32)
            if len(out) == n:
                break
        h = hashlib.sha256(h).digest()
    return out


def _fake_image_decode(data: bytes, meta: dict) -> dict:
    # STUB: a real implementation returns PIL.Image.open(BytesIO(data)).
    w = int(meta.get("width", 0) or 0)
    h = int(meta.get("height", 0) or 0)
    return {"width": w, "height": h, "ok": data is not None and len(data) > 0}


_STUB_DECODERS: dict[str, Callable[[bytes, dict], dict]] = {
    "image": _fake_image_decode,
}


def register_decoder(modality: str, fn: Callable[[bytes, dict], dict]) -> None:
    """Install a real codec for a modality (e.g. Pillow-based image decode)."""
    _STUB_DECODERS[modality] = fn


# ---------------------------------------------------------------------------
# Plumbing operators (real, tested)
# ---------------------------------------------------------------------------
def pack_multimodal(
    df: DataFrame,
    content_expr: str,
    modality: str,
    meta_exprs: dict[str, str] | None = None,
) -> DataFrame:
    """Normalize any table into the multimodal schema convention."""
    metas = []
    for k, v in (meta_exprs or {}).items():
        metas += [F.lit(k), F.expr(v).cast("string")]
    return df.withColumn("content", F.expr(content_expr).cast("binary")) \
             .withColumn("modality", F.lit(modality)) \
             .withColumn("meta", F.create_map(*metas) if metas else
                         F.create_map().cast("map<string,string>"))


def extract_features(
    df: DataFrame,
    *,
    feature_dim: int = 16,
    content_col: str = "content",
    keep_content: bool = False,
) -> DataFrame:
    """Per-item feature vector via Arrow-batched mapInPandas.

    Output schema = input schema (minus content unless kept) + ``features
    array<float>``.  The feature kernel is the deterministic stub; the
    batching/partitioning/schema contract is what production swaps onto.
    """
    in_schema = df.schema
    keep_fields = [f for f in in_schema.fields
                   if keep_content or f.name != content_col]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in keep_fields]
        + ["features array<float>"]
    )
    keep_names = [f.name for f in keep_fields]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _stable_floats(b if isinstance(b, (bytes, bytearray)) else b"",
                               feature_dim, "feat")
                for b in pdf[content_col]
            ]
            out = pdf[keep_names].copy()
            out["features"] = feats
            yield out

    return df.mapInPandas(batches, out_schema)


def decode_media(
    df: DataFrame,
    *,
    content_col: str = "content",
    modality_col: str = "modality",
    meta_col: str = "meta",
) -> DataFrame:
    """Run the per-modality decode kernel; appends ``decoded
    map<string,string>`` with decoder outputs (stub kernels here — see
    module docstring)."""
    in_schema = df.schema
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in in_schema.fields]
        + ["decoded map<string,string>"]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = []
            for b, mod, meta in zip(pdf[content_col], pdf[modality_col],
                                    pdf[meta_col]):
                fn = _STUB_DECODERS.get(mod)
                if fn is None:
                    decoded.append({"error": f"no decoder for {mod}"})
                    continue
                meta_dict = dict(meta) if meta is not None else {}
                try:
                    decoded.append(
                        {k: str(v) for k, v in fn(bytes(b or b""), meta_dict).items()}
                    )
                except NotImplementedError:
                    decoded.append({"error": "decoder not implemented"})
            out = pdf.copy()
            out["decoded"] = decoded
            yield out

    return df.mapInPandas(batches, out_schema)


def sample_frames(
    df: DataFrame,
    *,
    every_ms: int = 1000,
    meta_col: str = "meta",
    max_frames: int = 64,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame offset.

    Offsets are derived from declared ``duration_ms`` metadata — a pure
    column computation (sequence + explode), fully JVM-side; only the frame
    DECODE (not done here) needs Python.  Caps at ``max_frames`` per item.
    """
    duration = F.coalesce(
        F.element_at(F.col(meta_col), "duration_ms").cast("bigint"), F.lit(0)
    )
    n = F.least(duration / F.lit(every_ms), F.lit(max_frames)).cast("int")
    # items shorter than one interval yield no frames (empty array explodes
    # to zero rows) — guard so sequence() never sees a negative bound
    offsets = F.when(
        F.col("__n__") > 0,
        F.sequence(F.lit(0), (F.col("__n__") - 1) * every_ms, F.lit(every_ms)),
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.withColumn("__n__", n)
        .withColumn("frame_offset_ms", F.explode(offsets))
        .drop("__n__")
    )


def resize_images(
    df: DataFrame,
    *,
    width: int,
    height: int,
    content_col: str = "content",
    meta_col: str = "meta",
) -> DataFrame:
    """Image resize plumbing: updates declared dimensions in metadata and
    (in production) re-encodes the payload.  The pixel transform is the
    stub — payload passes through; the metadata/schema contract is real."""
    in_schema = df.schema
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in in_schema.fields
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            new_meta = []
            for m in out[meta_col]:
                d = dict(m) if m is not None else {}
                d["width"], d["height"] = str(width), str(height)
                d["resized"] = "stub"  # STUB: real impl re-encodes pixels
                new_meta.append(d)
            out[meta_col] = new_meta
            yield out

    return df.mapInPandas(batches, out_schema)
