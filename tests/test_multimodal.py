"""Multimodal pack: binary payload plumbing + decode-stub determinism.

The oracle-checkable queries (metadata rollup, frame sampling) are
covered by tests/test_catalog_oracle.py; here we verify the parts SQL
can't express — the mapInPandas decode kernel against a local NumPy
recompute, schema/typing of the binary columns, and payload-column
pruning for metadata-only plans.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_virus_analysis_spark.operators.multimodal import (
    attach_binary_payload,
    decode_features,
    payload_metadata_stats,
)
from big_data_virus_analysis_spark.sources.tables import load_table

from conftest import SMOKE_SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SMOKE_SF_DIR, "documents").cache()


def test_payload_schema(docs):
    df = attach_binary_payload(docs)
    assert isinstance(df.schema["payload"].dataType, T.BinaryType)
    meta = df.schema["meta"].dataType
    assert isinstance(meta, T.StructType)
    assert [f.name for f in meta.fields] == ["mime", "n_bytes", "width", "height"]
    row = df.where(F.col("doc_id") == 0).first()
    assert bytes(row["payload"]).decode("utf-8")  # round-trips as UTF-8
    assert row["meta"]["n_bytes"] == len(row["payload"])


def test_decode_stub_matches_local_recompute(docs):
    got = {r["doc_id"]: r for r in decode_features(docs).collect()}
    for r in docs.select("doc_id", "text").limit(50).collect():
        arr = np.frombuffer(r["text"].encode("utf-8"), dtype=np.uint8)
        g = got[r["doc_id"]]
        assert g["n_bytes"] == arr.size
        assert g["mean_byte"] == float(arr.mean())  # exact: integer sum / size
        want_ck = int((arr.astype(np.int64) * (np.arange(arr.size) % 97 + 1)).sum())
        assert g["checksum"] == want_ck
    assert len(got) == docs.count()


def test_metadata_plan_prunes_payload(docs):
    """A metadata-only rollup must not carry the payload bytes past the
    project: `payload` appears nowhere in the physical plan."""
    plan = payload_metadata_stats(docs)._sc._jvm.PythonSQLUtils.explainString(
        payload_metadata_stats(docs)._jdf.queryExecution(), "formatted"
    )
    assert "payload" not in plan


def test_resize_payloads_sizes_and_determinism(spark):
    import math

    from big_data_virus_analysis_spark.operators.multimodal import (
        FRAME_BYTES,
        resize_payloads,
    )
    from big_data_virus_analysis_spark.sources.tables import load_table

    from conftest import SMOKE_SF_DIR

    docs = load_table(spark, SMOKE_SF_DIR, "documents")
    out = resize_payloads(docs, stride=2).collect()
    assert len(out) == docs.count()
    for r in out:
        n_rows = r.src_bytes // FRAME_BYTES
        expect = math.ceil(n_rows / 2) * math.ceil(FRAME_BYTES / 2)
        assert r.dst_bytes == expect
    again = {r.doc_id: r.dst_checksum for r in resize_payloads(docs, stride=2).collect()}
    assert again == {r.doc_id: r.dst_checksum for r in out}


# --------------------------------------------------------------------------
# round-8: real codec path (r7 VERDICT directive #3) — gated like
# protobuf/transformWithState, with a rot-proof meta-test
# --------------------------------------------------------------------------


def test_decode_image_features_real_codec(spark):
    """REAL PIL decode over generated PNGs: runs wherever pillow exists
    (requirements-optional.txt); importorskip-gated because the offline
    build container cannot install it."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from big_data_virus_analysis_spark.operators.multimodal import (
        decode_image_features,
    )

    rng = np.random.default_rng(7)
    rows, expected = [], {}
    for doc_id, (w, h) in enumerate([(8, 5), (16, 16), (3, 11)]):
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr, mode="RGB").save(buf, format="PNG")
        rows.append((doc_id, bytearray(buf.getvalue())))
        expected[doc_id] = (w, h, w * h, float(arr.astype(np.int64).sum() / arr.size))
    frames = spark.createDataFrame(
        rows, schema="doc_id bigint, payload binary"
    )
    got = {r.doc_id: r for r in decode_image_features(frames).collect()}
    assert set(got) == set(expected)
    for doc_id, (w, h, npx, mean) in expected.items():
        r = got[doc_id]
        assert (r.width, r.height, r.n_pixels) == (w, h, npx)
        assert abs(r.mean_pixel - mean) < 1e-12  # PNG is lossless


def test_pil_gate_cannot_rot():
    """Meta-test (same contract as test_tws_gate_cannot_rot): the real-
    codec test above is importorskip-gated on PIL because this container
    cannot install pillow offline.  The gate must not silently rot:

    * PIL absent  -> the import really is impossible, the operator
      raises the documented ImportError, and requirements-optional.txt
      records the dependency;
    * PIL present -> the importorskip gate cannot skip (same condition),
      so the real decode test RUNS in this session; assert the gating
      condition is the bare import and the operator no longer raises.
    """
    import os

    try:
        import PIL  # noqa: F401

        pil_available = True
    except ImportError:
        pil_available = False

    from big_data_virus_analysis_spark.operators import multimodal

    assert multimodal.HAVE_PIL == pil_available
    req = open(
        os.path.join(os.path.dirname(__file__), "..", "requirements-optional.txt")
    ).read()
    assert "pillow" in req.lower()
    if pil_available:
        import inspect

        src = inspect.getsource(test_decode_image_features_real_codec)
        assert 'pytest.importorskip("PIL")' in src
    else:
        with pytest.raises(ImportError, match="pillow"):
            multimodal.decode_image_features(None)
