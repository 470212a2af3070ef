"""Multimodal (image/audio/video) columns: opaque ``binary`` payloads with
typed metadata, processed by Arrow-batched pandas UDFs.

Engine-added: the reference's only raster concept is the OpenCL image
buffer (``include/projcl/projcl_warp.h:16-28``); a 100-TB training-data
pipeline additionally needs media blobs as table columns.  The container
has no image/audio codecs, so the DECODE step is stubbed (clearly marked):
``decode_pixels`` runs a deterministic fake derived from the payload bytes
by default (a real codec is the opt-in ``use_codec=True`` seam — never
implicit, so the oracled gate queries are environment-independent).
Everything Spark-side — schema, binary
handling, Arrow batch shape, mapInPandas signatures, partitioning — is
real and tested.

Payload format of the synthetic blobs (parsed for real by the UDFs):
``b"PCLMEDIA|<kind>|<width>|<height>|<n_frames>|" + payload-bytes``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, FloatType, IntegerType, LongType, StringType, StructField, StructType,
)

META_SCHEMA = StructType([
    StructField("kind", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("n_bytes", LongType()),
])


def synth_media(spark: SparkSession, n: int, num_partitions: int | None = None) -> DataFrame:
    """Deterministic media table: (media_ref, kind, data binary).

    Dimensions derive from the ref hash; the binary embeds the parseable
    header so decode UDFs exercise real byte handling."""
    kw = {"numPartitions": num_partitions} if num_partitions else {}
    base = spark.range(0, n, 1, **kw).select(
        F.concat(F.lit("m://"), F.md5(F.col("id").cast("string"))).alias("media_ref"),
        F.element_at(
            F.array(F.lit("image"), F.lit("video"), F.lit("audio")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.col("id"),
    )
    h = F.conv(F.substring(F.md5(F.concat(F.lit("dim:"), F.col("id").cast("string"))), 1, 15), 16, 10).cast("long")
    w = (h % 960 + 64).cast("int")
    hh = (F.shiftright(h, 10) % 960 + 64).cast("int")
    frames = F.when(F.col("kind") == "image", 1).otherwise((F.shiftright(h, 20) % 240 + 1)).cast("int")
    header = F.format_string("PCLMEDIA|%s|%d|%d|%d|", "kind", w, hh, frames)
    return base.select(
        "media_ref", "kind",
        F.encode(F.concat(header, F.md5(F.concat(F.lit("payload:"), F.col("id").cast("string")))), "utf-8").alias("data"),
    )


def _parse_headers(data: pd.Series) -> pd.DataFrame:
    """Vectorized header parse of ``PCLMEDIA|kind|w|h|frames|payload`` blobs:
    pandas ``.str`` byte ops (C loops), no Python-level per-row iteration."""
    s = data.astype(object)
    n_bytes = s.str.len().astype("Int64")
    # decode only the header slice (≤64 B covers "PCLMEDIA|kind|w|h|f|"),
    # not multi-MB payloads; latin-1 is a bijective byte↔char map, so any
    # stray binary bytes inside the slice survive the decode
    parts = s.str.slice(0, 64).str.decode("latin-1").str.split("|", n=5, expand=True)
    # a batch of only NULL/markerless blobs yields fewer than 6 split
    # columns — reindex so such rows parse to nulls instead of KeyError
    parts = parts.reindex(columns=range(6))
    # a header whose 5th '|' lands past the 64-byte slice splits into < 6
    # parts; its numeric fields would be TRUNCATED (e.g. frames '789' →
    # '78') and parse to a plausible wrong value — null the whole header
    # instead (parts[5] is the payload remainder; NaN ⟺ separator absent)
    complete = parts[5].notna()
    kind = parts[1].where(complete)
    width = pd.to_numeric(parts[2].where(complete), errors="coerce").astype("Int64")
    height = pd.to_numeric(parts[3].where(complete), errors="coerce").astype("Int64")
    frames = pd.to_numeric(parts[4].where(complete), errors="coerce").astype("Int64")
    return pd.DataFrame({"kind": kind, "width": width, "height": height,
                         "n_frames": frames, "n_bytes": n_bytes})


@F.pandas_udf(META_SCHEMA)
def decode_meta(data: pd.Series) -> pd.DataFrame:
    """Parse the typed header out of the binary payload (real byte work,
    vectorized over the Arrow batch)."""
    return _parse_headers(data)


def decode_pixels(blob: bytes, width: int, height: int,
                  use_codec: bool = False) -> np.ndarray:
    """STUB DECODE: returns the pixel array for a media blob.

    The DEFAULT path is the deterministic stub — always, even when Pillow
    happens to be importable: the oracled gate queries depend on the stub
    payload formula, and the synthetic ``PCLMEDIA|...`` blobs are not real
    image bytes anyway (a codec would raise or diverge from the DuckDB
    oracle).  A real decoder is opt-in via ``use_codec=True``, which is
    the clearly-marked NotImplementedError seam to wire PIL/libvips into
    on a real cluster.

    The stub READS THE ACTUAL PAYLOAD BYTES (the part after the 5th
    ``|``): pixel(y, x) = payload[(31·x + 17·y) mod len(payload)].  That
    keeps the Spark-side plumbing identical to a real decoder (binary →
    numpy (h, w) array inside an Arrow batch, per-blob byte access) AND
    makes the decode SQL-expressible, so ``resize_stats`` gets a DuckDB
    value oracle (``__spark_entry__._o_media_resize``)."""
    if use_codec:
        raise NotImplementedError(
            "real image decode is intentionally stubbed in this sandbox; "
            "plug a PIL/libvips decoder here on a real cluster"
        )
    payload = bytes(blob).split(b"|", 5)[5]
    if not payload:
        payload = b"\x00"
    pb = np.frombuffer(payload, dtype=np.uint8)
    idx = (31 * np.arange(width)[None, :] + 17 * np.arange(height)[:, None]) % len(pb)
    return pb[idx].astype(np.int64)


def resize_stats(df: DataFrame, target: int = 32) -> DataFrame:
    """Decode (stub) → resize by block-mean → per-image stats, via
    ``mapInPandas`` (whole-row batches: the shape multimodal feature
    extraction takes at scale)."""
    out_schema = StructType([
        StructField("media_ref", StringType()),
        StructField("out_w", IntegerType()),
        StructField("out_h", IntegerType()),
        StructField("mean_e3", LongType()),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # header parse is vectorized pandas byte ops; only the (stub)
            # DECODE below is inherently per-blob (as a real codec would be)
            hdr = _parse_headers(pdf["data"])
            ws = np.minimum(hdr["width"].to_numpy(np.int64), 64)
            hs = np.minimum(hdr["height"].to_numpy(np.int64), 64)
            ows, ohs, means = [], [], []
            for blob, w, h in zip(pdf["data"], ws, hs):
                px = decode_pixels(bytes(blob), int(w), int(h))  # cap stub size
                oh = min(target, px.shape[0])
                ow = min(target, px.shape[1])
                small = px[: oh * (px.shape[0] // oh) if px.shape[0] >= oh else oh,
                           : ow * (px.shape[1] // ow) if px.shape[1] >= ow else ow]
                ows.append(ow)
                ohs.append(oh)
                # integer round-half-up of 1000·mean: float round() would
                # banker's-round exact .5 ties differently than SQL round()
                tot, npix = int(small.sum()), small.size
                means.append((tot * 1000 + npix // 2) // npix)
            yield pd.DataFrame({"media_ref": pdf["media_ref"].to_numpy(),
                                "out_w": ows, "out_h": ohs, "mean_e3": means})

    return df.mapInPandas(fn, out_schema)


def frame_sample(meta_df: DataFrame, stride: int = 10) -> DataFrame:
    """Sample frame indices 0, stride, 2·stride… per video (pure Spark —
    the explode/downstream-decode shape for video pipelines)."""
    return meta_df.filter(F.col("n_frames") > 1).select(
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(stride))
        ).alias("frame_idx"),
    )


def embed_components(payload: str, dim: int) -> list[float]:
    """Raw (pre-normalization) fake-embedding components from the payload:
    component_i = first-60-bits(md5('emb:'+payload+':'+i)) / 2^59 − 1
    ∈ [−1, 1).  Every step is a deterministic IEEE double op, and the same
    formula is SQL-expressible (``oracle.hash60`` + exact power-of-two
    scaling), so the gate query gets a value oracle."""
    return [
        int(hashlib.md5(f"emb:{payload}:{i}".encode()).hexdigest()[:15], 16)
        / 2.0**59 - 1.0
        for i in range(dim)
    ]


def embed_stub(df: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic fake embedding per blob via mapInPandas — the
    plumbing a real vision encoder would use (Arrow in, Arrow out).  The
    stand-in components derive from the ACTUAL payload bytes
    (``embed_components``); normalization uses an explicitly SEQUENTIAL
    sum of squares so the oracle's left-associative SQL sum replays the
    identical IEEE operation sequence."""
    out_schema = StructType([
        StructField("media_ref", StringType()),
        StructField("embedding", ArrayType(FloatType())),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            embs = []
            for blob in pdf["data"]:
                payload = bytes(blob).split(b"|", 5)[5].decode("latin-1")
                v = embed_components(payload, dim)
                acc = 0.0
                for x in v:  # sequential: matches the oracle's (((v0²+v1²)+…)
                    acc += x * x
                nrm = math.sqrt(acc)
                embs.append(
                    np.asarray([x / nrm for x in v], dtype=np.float64)
                    .astype(np.float32).tolist()
                )
            yield pd.DataFrame({"media_ref": pdf["media_ref"], "embedding": embs})

    return df.mapInPandas(fn, out_schema)
