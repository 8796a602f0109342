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
