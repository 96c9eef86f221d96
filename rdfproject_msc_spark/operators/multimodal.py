"""Multimodal-column operators: opaque binary payloads + typed metadata.

Design (the 100 TB pattern for images/audio/video in a Spark pipeline):

- the payload is an opaque ``binary`` column; Spark never interprets it —
  it shuffles/stores bytes, and only Arrow-batched Python ever decodes.
- typed metadata rides NEXT to the payload as a struct column, so filters
  and aggregations (the common 99% of pipeline work) run JVM-side on plain
  columns with predicate pushdown — no decode needed to ask "all JPEGs
  under 1 MB".
- decode / feature-extract / resize / frame-sample are ``mapInPandas``
  stages: Arrow ships (id, content) batches to Python, the heavy libraries
  (PIL / cv2 / librosa) run vectorized per batch, and the output schema is
  declared up front so Catalyst keeps planning around the black box.
- the decode libraries are NOT in this container: each decoder tries the
  real import and otherwise falls back to a clearly-marked DETERMINISTIC
  FAKE derived from the raw bytes. The Spark-side plumbing — schemas,
  batch iteration, partitioning behavior — is real and tested either way.

The testdata carries no binary column, so ``attach_assets`` derives a
deterministic one from the documents table (payload = UTF-8 bytes of the
text). The derivation is intentionally expressible in ANSI SQL, so the
metadata/stats operators are DuckDB-oracle-checkable end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MODALITIES = ("image", "audio", "video")


def attach_assets(
    docs: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Derive a deterministic multimodal asset table from the documents:

    (doc_id, modality, content: binary, meta: struct<n_bytes, width,
    height, sample_rate>)

    modality cycles image/audio/video by doc_id; the fake dimensions are
    pure functions of the byte length (SQL-expressible → oracle-checkable).
    Real pipelines replace this with a parquet/tar reader producing the same
    shape; everything downstream is agnostic to where the bytes came from.
    """
    nb = F.octet_length(F.col(content_col)).cast("long")
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col),
        modality.alias("modality"),
        F.encode(F.col(content_col), "UTF-8").alias("content"),
        F.struct(
            nb.alias("n_bytes"),
            (nb % 640 + 1).alias("width"),
            ((nb * 7) % 480 + 1).alias("height"),
            (F.lit(8000) + nb % 3 * 8000).alias("sample_rate"),
        ).alias("meta"),
    )


def asset_stats(assets: DataFrame) -> DataFrame:
    """Per-modality corpus stats — metadata-only: runs JVM-side, never
    touches the payload bytes (scan prunes the content column entirely)."""
    return assets.groupBy("modality").agg(
        F.count("*").alias("n_assets"),
        F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
        F.round(F.avg(F.col("meta.n_bytes")), 6).alias("avg_bytes"),
        F.max(F.col("meta.width")).alias("max_width"),
        F.min(F.col("meta.height")).alias("min_height"),
    )


def filter_assets(
    assets: DataFrame,
    modality: str | None = None,
    min_bytes: int | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Metadata predicate pushdown over a multimodal table: the filters are
    plain column comparisons — on a parquet-backed asset store they reach
    the scan, and the content column is read only for surviving rows."""
    out = assets
    if modality is not None:
        out = out.filter(F.col("modality") == modality)
    if min_bytes is not None:
        out = out.filter(F.col("meta.n_bytes") >= min_bytes)
    if max_bytes is not None:
        out = out.filter(F.col("meta.n_bytes") <= max_bytes)
    return out


# ---------------------------------------------------------------------------
# decode / feature-extract (mapInPandas black boxes with declared schemas)

DECODE_SCHEMA = (
    "doc_id long, modality string, ok boolean, decoder string, "
    "width int, height int, n_channels int, n_frames int"
)


def decode_assets(assets: DataFrame) -> DataFrame:
    """Decode stage: Arrow-batched ``mapInPandas`` over (id, modality,
    content). Tries the real decoder imports; falls back to the
    deterministic fake. Output schema is declared (DECODE_SCHEMA) so the
    stage composes with JVM-side planning downstream.

    The decoder is a NESTED def so cloudpickle ships it by VALUE: the
    Python workers need no importable copy of this package on their path
    (a module-level helper would pickle as a module reference and fail on
    workers whose sys.path lacks the repo — e.g. a driver launched from a
    different working directory)."""

    def _fake_decode(content: bytes) -> tuple[int, int, int, int]:
        """DETERMINISTIC FAKE decoder (real image/audio libs absent in
        this container): dimensions derived from the first payload bytes.
        Replace the body with PIL/cv2 calls in production; the operator
        contract — batch in, fixed-schema records out — is identical."""
        if not content:
            return (0, 0, 0, 0)
        w = content[0] % 64 + 1
        h = content[-1] % 64 + 1
        ch = content[len(content) // 2] % 3 + 1
        frames = len(content) % 16 + 1
        return (w, h, ch, frames)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:  # pragma: no cover - not installed in this container
            from PIL import Image  # noqa: F401

            decoder = "pillow"
        except ImportError:
            decoder = "fake"
        for pdf in batches:
            dims = [_fake_decode(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "ok": [c is not None and len(c) > 0 for c in pdf["content"]],
                    "decoder": decoder,
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_channels": [d[2] for d in dims],
                    "n_frames": [d[3] for d in dims],
                }
            )

    return assets.select("doc_id", "modality", "content").mapInPandas(
        decode_batches, schema=DECODE_SCHEMA
    )


RESIZE_SCHEMA = "doc_id long, content binary, out_width int, out_height int"


def resize_images(assets: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize stage (images only): the real implementation is
    PIL.Image.resize per batch; the fake keeps the contract — output payload
    is a deterministic function of the input bytes with length
    width*height (byte-stride downsample), so tests can pin it."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            out = []
            for c in pdf["content"]:
                if not c:
                    out.append(b"")
                    continue
                stride = max(len(c) // target, 1)
                out.append(bytes(c[::stride])[:target])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": out,
                    "out_width": width,
                    "out_height": height,
                }
            )

    images = assets.filter(F.col("modality") == "image")
    return images.select("doc_id", "content").mapInPandas(
        resize_batches, schema=RESIZE_SCHEMA
    )


FRAME_SCHEMA = "doc_id long, frame_idx int, byte_offset long, frame binary"


def sample_frames(assets: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame-sampling stage (videos): one output row per sampled frame —
    a mapInPandas row-expanding stage (batch in, MORE rows out), the shape
    real video decoders (cv2.VideoCapture / pyav) use. Fake frames are
    fixed-size byte slices at deterministic offsets."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frame_len = 16
        for pdf in batches:
            ids, idxs, offs, frames = [], [], [], []
            for doc_id, c in zip(pdf["doc_id"], pdf["content"]):
                if not c:
                    continue
                n_frames = max(len(c) // frame_len, 1)
                for i in range(0, n_frames, every_n):
                    off = i * frame_len
                    ids.append(doc_id)
                    idxs.append(i)
                    offs.append(off)
                    frames.append(bytes(c[off : off + frame_len]))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "byte_offset": offs,
                    "frame": frames,
                }
            )

    videos = assets.filter(F.col("modality") == "video")
    return videos.select("doc_id", "content").mapInPandas(
        frame_batches, schema=FRAME_SCHEMA
    )
