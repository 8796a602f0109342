"""Multimodal columns: opaque binary payloads + typed metadata.

The training-data-pipeline extension for image/audio/video content
(no reference counterpart — the reference is text-only).  Design:

* payloads are **opaque ``binary`` columns** with a typed metadata
  struct alongside (mime, n_bytes, declared dims) — schema-on-write, the
  engine never guesses content type from bytes;
* decode / feature-extraction runs as **Arrow-batched ``mapInPandas``**
  — columnar transfer, one Python process per task, batch size bounded
  by ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a partition of
  large payloads never materializes at once;
* real codecs (PIL/librosa/av) are NOT in this container: the decode
  kernel is a clearly-marked deterministic stub behind an import-try —
  the Spark-side plumbing (schema, batching, partitioning, explode
  shape) is real and oracle-tested where SQL-expressible.

Payload synthesis: since the synthetic tables carry no binary column,
``attach_binary_payload`` derives one deterministically from
``documents.text`` (UTF-8 bytes) — a stand-in with the same plumbing as
parquet-stored image bytes.

Scale notes: payload bytes dominate row size, so the frame/patch
exploders repartition by doc_id first — one doc's frames stay on one
executor (locality for the decode kernel) while docs spread evenly;
column pruning matters more than usual (never scan ``payload`` for a
metadata-only query — tests assert the pruned ReadSchema).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real decoder path — absent in this container, kept importable
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except Exception:  # pragma: no cover
    HAVE_PIL = False

FRAME_BYTES = 64  # fixed-size "frame" for the video-like sampler


def attach_binary_payload(documents: DataFrame) -> DataFrame:
    """documents → (doc_id, payload: binary, meta: struct).

    The metadata struct is what a real ingest would carry from the
    upstream extractor (mime sniffed at write time, byte length, and
    declared dimensions); here dims are derived deterministically.
    """
    payload = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
            (F.col("doc_id") % 4 * 160 + 320).cast("int").alias("width"),
            (F.col("doc_id") % 3 * 120 + 240).cast("int").alias("height"),
        ).alias("meta"),
    )


def payload_metadata_stats(documents: DataFrame) -> DataFrame:
    """Metadata-only rollup — must NOT read payload bytes (column
    pruning down to the scan; asserted in tests/test_plans.py).

    Output: (width, height, n_docs, total_bytes, avg_bytes).
    """
    with_payload = attach_binary_payload(documents)
    return (
        with_payload.select("meta.width", "meta.height", "meta.n_bytes")
        .groupBy("width", "height")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            # exact integer sum / count as one IEEE division — identical
            # on any engine; round(avg(double)) is impl-divergent
            (F.sum("n_bytes").cast("double") / F.count("*")).alias("avg_bytes"),
        )
    )


def sample_frames(documents: DataFrame, every_kth: int = 4) -> DataFrame:
    """Video-style frame sampling: split each payload into fixed
    FRAME_BYTES windows, keep every k-th — pure built-in expressions
    (substring over binary), no Python in the plan.

    Output: (doc_id, frame_idx, frame_len) — frame_idx 0-based over the
    KEPT frames' source positions (0, k, 2k, ...).
    """
    with_payload = attach_binary_payload(documents)
    n_frames = F.ceil(F.col("meta.n_bytes") / F.lit(FRAME_BYTES)).cast("int")
    idxs = F.filter(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: i % every_kth == 0,
    )
    return (
        with_payload.select(
            "doc_id",
            "payload",
            F.explode(idxs).alias("frame_idx"),
        )
        .select(
            "doc_id",
            "frame_idx",
            F.octet_length(
                F.expr(f"substring(payload, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})")
            ).alias("frame_len"),
        )
    )


def decode_features(documents: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Per-payload decoded features via Arrow-batched ``mapInPandas``.

    The kernel here is the DETERMINISTIC byte-stats path (mean byte, a
    positional checksum) over the synthetic UTF-8 payloads — the
    always-on exact-oracle check for the decode plumbing.  The REAL
    codec path with identical plumbing is
    :func:`decode_image_features` (PIL, gated on availability).  The
    schema, batching, and partition shape are shared.

    The synthetic payload format is fully specified — UTF-8 bytes of an
    ASCII ``text`` column — so the decode has a closed-form EXACT oracle
    (bytes are the character codes; see `decode_features` in
    plans/catalog.py): n_bytes = length, mean = integer-sum/size as one
    IEEE division (byte sums are exact in float64, so numpy and any SQL
    engine agree bit-for-bit; the mean is deliberately NOT rounded —
    round-half tie conventions differ between engines, exact doubles
    don't), checksum = Σ byte·((pos % 97)+1).

    Output: (doc_id, n_bytes, mean_byte, checksum).
    """
    with_payload = attach_binary_payload(documents).repartition("doc_id")

    def decode(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                rows.append(
                    (
                        int(doc_id),
                        int(arr.size),
                        float(arr.mean()) if arr.size else 0.0,
                        int((arr.astype(np.int64) * (np.arange(arr.size) % 97 + 1)).sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "mean_byte", "checksum"]
            )

    return with_payload.select("doc_id", "payload").mapInPandas(
        decode, schema="doc_id bigint, n_bytes bigint, mean_byte double, checksum bigint"
    )


def decode_image_features(frames: DataFrame, batch_hint: int = 64) -> DataFrame:
    """REAL image decode over a ``(doc_id, payload: binary)`` frame —
    PIL opens each payload as an encoded image (PNG/JPEG/...) and the
    kernel emits per-image pixel stats.  This is the actual codec slot
    the byte-stats stub in :func:`decode_features` stands in for; both
    share the mapInPandas plumbing (Arrow batches, per-task Python
    worker, doc-locality repartition left to the caller).

    Gated exactly like the protobuf/transformWithState pattern: PIL is
    not installable in the offline build container
    (requirements-optional.txt), so the call raises ImportError
    driver-side when the codec is absent, tests ``importorskip`` on
    PIL, and ``test_pil_gate_cannot_rot`` (tests/test_multimodal.py)
    fails if the environment ever gains PIL without this path running.

    Output: (doc_id, width, height, n_pixels, mean_pixel) —
    mean over all channels as float64 (exact: integer pixel sums are
    < 2^53, one IEEE division).
    """
    if not HAVE_PIL:
        raise ImportError(
            "decode_image_features needs PIL (pillow) — not installable "
            "in the offline container; see requirements-optional.txt"
        )

    def decode(batches: Iterator) -> Iterator:
        import io

        import numpy as np
        import pandas as pd
        from PIL import Image

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                with Image.open(io.BytesIO(payload)) as img:
                    arr = np.asarray(img, dtype=np.uint8)
                rows.append(
                    (
                        int(doc_id),
                        int(arr.shape[1]),
                        int(arr.shape[0]),
                        int(arr.shape[0] * arr.shape[1]),
                        float(arr.astype(np.int64).sum() / arr.size),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "n_pixels", "mean_pixel"],
            )

    return frames.select("doc_id", "payload").mapInPandas(
        decode,
        schema=(
            "doc_id bigint, width int, height int, "
            "n_pixels bigint, mean_pixel double"
        ),
    )


def resize_payloads(documents: DataFrame, stride: int = 2) -> DataFrame:
    """Nearest-neighbor "resize" of each payload treated as a byte grid
    (rows of FRAME_BYTES): keep every ``stride``-th byte of every
    ``stride``-th full row — the real downsample kernel shape
    (strided slicing over an ndarray in Arrow-batched ``mapInPandas``),
    with byte grids standing in for pixel planes since the container
    ships no codecs.  The tail partial row is dropped (floor to full
    rows), making output sizes a closed-form function of n_bytes:
    ``ceil(floor(n/64)/stride) * ceil(64/stride)`` — which is what the
    catalog oracle checks (`resize_payload_sizes`).

    Output: (doc_id, src_bytes, dst_bytes, dst_checksum).
    """
    with_payload = attach_binary_payload(documents)

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                n_rows = arr.size // FRAME_BYTES
                grid = arr[: n_rows * FRAME_BYTES].reshape(n_rows, FRAME_BYTES)
                small = grid[::stride, ::stride]
                rows.append(
                    (
                        int(doc_id),
                        int(arr.size),
                        int(small.size),
                        int(
                            (
                                small.astype(np.int64).ravel()
                                * (np.arange(small.size) % 251 + 1)
                            ).sum()
                        ),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "src_bytes", "dst_bytes", "dst_checksum"]
            )

    return with_payload.select("doc_id", "payload").mapInPandas(
        kernel,
        schema="doc_id bigint, src_bytes bigint, dst_bytes bigint, dst_checksum bigint",
    )
