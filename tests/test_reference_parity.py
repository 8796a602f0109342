"""Reference-corpus golden tests (SURVEY.md §5.2).

Runs the engine's feature pipeline over the reference's REAL checked-in
corpus (`/root/reference/api_logs/`, read-only) and compares against the
reference's own golden artifacts:

* `topFeatures.txt` — the 68 surviving (feature, info-gain) pairs.  The
  IG values are deterministic (pure arithmetic over doc-frequencies), so
  the comparison is exact-to-tolerance, per feature.
* corpus statistics from BASELINE.md — 720 clean + 884 virus files,
  124 distinct cleaned API tokens.
* LIBSVM grammar invariants (the reference's committed LIBSVMOutput.txt
  came from a 162-sample subset run, and its index assignment was
  partition-order-nondeterministic — SURVEY.md §7 "deterministic feature
  indexing" — so we assert structure, not bytes).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from big_data_virus_analysis_spark.operators.features import info_gain_ranking
from big_data_virus_analysis_spark.operators.vectorize import (
    doc_vectors,
    libsvm_text,
)
from big_data_virus_analysis_spark.sources.api_logs import (
    api_log_tokens,
    file_features,
    read_api_logs,
)

REF = "/root/reference"
CLEAN_DIR = f"{REF}/api_logs/clean_LOGS_CONVERTED"
VIRUS_DIR = f"{REF}/api_logs/virus_LOGS_CONVERTED"


@pytest.fixture(scope="module")
def raw_logs(spark):
    return read_api_logs(spark, CLEAN_DIR, VIRUS_DIR).cache()


@pytest.fixture(scope="module")
def golden_features() -> dict[str, float]:
    out = {}
    with open(f"{REF}/topFeatures.txt") as f:
        for line in f:
            m = re.match(r"\(([^,]+),([0-9.Ee-]+)\)", line.strip())
            if m:
                out[m.group(1)] = float(m.group(2))
    assert len(out) == 68
    return out


def test_corpus_statistics(raw_logs):
    counts = dict(
        raw_logs.select("file", "class")
        .distinct()
        .groupBy("class")
        .count()
        .collect()
    )
    assert counts == {"clean": 720, "virus": 884}  # readme.md:87


def test_distinct_cleaned_tokens(raw_logs):
    feats = file_features(raw_logs)
    assert feats.select("api").distinct().count() == 124  # BASELINE.md


# The committed topFeatures.txt is NOT reproducible from the committed
# corpus: its token `Executing:C:\ProgramFiles` does not occur in any
# checked-in log (the logs carry `Executing:C:\Users\leesteele\...`
# paths instead), and no shared token's IG value matches — the golden
# was generated from an earlier corpus snapshot (most likely the
# 162-sample subset that also produced output.txt / LIBSVMOutput.txt,
# both 162 lines).  So golden-vs-engine comparison is *structural*
# (survivor-set containment, grammar), and value regression is guarded
# by a self-golden computed deterministically from the committed corpus.

#: engine output over the committed corpus — deterministic (pure
#: integer doc-frequency arithmetic), so exact equality is asserted
SELF_GOLDEN_TOP10 = [
    ("CreateFile", 516, 192, 0.074592),
    ("CreateToolhelp32Snapshot", 306, 82, 0.055694),
    ("SetProcessDEPPolicy", 197, 29, 0.055459),
    ("WriteProcessMemory", 403, 145, 0.053061),
    ("CreateProcess", 411, 152, 0.052005),
    ("GetProcessDEPPolicy", 449, 181, 0.050391),
    ("AdjustTokenPrivileges", 301, 109, 0.034802),
    ("SystemParametersInfo", 502, 271, 0.026402),
    ("GetSystemDefaultLangID", 142, 33, 0.026295),
    ("GetUserName", 159, 50, 0.020294),
]
N_SURVIVORS = 84  # two-class tokens in the committed corpus (68 in golden's snapshot)


def test_info_gain_structural_parity(raw_logs, golden_features):
    ranked = info_gain_ranking(api_log_tokens(raw_logs), k=2000)
    got = {r["token"]: r["info_gain"] for r in ranked.collect()}
    assert len(got) == N_SURVIVORS
    # every golden survivor that still exists in the committed corpus
    # must survive our inner-join semantics too (66 of 68; the other 2
    # are path-tokens from the golden's drifted corpus)
    missing = set(golden_features) - set(got)
    assert missing == {r"Executing:C:\ProgramFiles", "InternetReadFile"}
    assert all(0.0 <= v <= 1.0 for v in got.values())


def test_info_gain_self_golden(raw_logs):
    ranked = info_gain_ranking(api_log_tokens(raw_logs), k=2000).orderBy("rank")
    top10 = [
        (r["token"], r["pos_df"], r["neg_df"], r["info_gain"])
        for r in ranked.limit(10).collect()
    ]
    assert top10 == SELF_GOLDEN_TOP10


def test_rank_is_deterministic_ig_order(raw_logs):
    ranked = info_gain_ranking(api_log_tokens(raw_logs), k=2000).collect()
    rows = sorted(ranked, key=lambda r: r["rank"])
    igs = [r["info_gain"] for r in rows]
    assert igs == sorted(igs, reverse=True)
    assert [r["rank"] for r in rows] == list(range(1, N_SURVIVORS + 1))


def test_libsvm_grammar_invariants(raw_logs):
    toks = api_log_tokens(raw_logs)
    vocab = info_gain_ranking(toks, k=2000).select("token", "rank")
    lines = libsvm_text(doc_vectors(toks, vocab)).collect()
    n_docs_with_hits = (
        toks.join(vocab.select("token"), "token", "left_semi")
        .select("doc")
        .distinct()
        .count()
    )
    # zero-hit files silently dropped (FeatureSelectionCloud.scala:482-483)
    assert len(lines) == n_docs_with_hits
    pat = re.compile(r"^(0\.0|1\.0)( \d+:1)+$")
    for r in lines:
        assert pat.match(r["line"]), r["line"]
        idxs = [int(p.split(":")[0]) for p in r["line"].split()[1:]]
        assert idxs == sorted(idxs)  # 1-based ascending rank indices
        assert 1 <= idxs[0] and idxs[-1] <= N_SURVIVORS


def test_byte_mode_tokenizer(spark, raw_logs):
    """Byte-mode shingling (createByteFeatures parity): windows are
    uppercased, fixed-width, and plug into the same IG ranking."""
    from big_data_virus_analysis_spark.sources.api_logs import api_log_byte_tokens

    toks = api_log_byte_tokens(raw_logs, width=14)
    sample = toks.limit(200).collect()
    assert sample
    for r in sample:
        assert len(r["token"]) == 14
        assert r["token"] == r["token"].upper()
        assert r["cls"] in ("pos", "neg")
    # a line shorter than the window yields no tokens; spot-check one
    # known API line produces the expected first window
    one = (
        raw_logs.where(F.col("raw_line").startswith("GetProcessDEPPolicy"))
        .limit(1)
        .select("raw_line")
        .first()
    )
    first_window = one["raw_line"][:14].upper()
    got = (
        api_log_byte_tokens(raw_logs.where(F.col("raw_line") == one["raw_line"]), 14)
        .limit(1)
        .first()
    )
    assert got["token"] == first_window


def test_d3_tree_structural_parity_with_golden(spark):
    """The engine's d3_export_tree must reproduce the golden
    `www/html/data.json` STRUCTURE (exportJSON.php:12-45): a 5-layer
    Main Container → "Cluster #i" → {Clean, Virus} → Sample → leaf
    {name, size} tree, 10 clusters, class children in {Clean, Virus}
    order (exportJSON.php:22,31), leaf sizes positive ints.  Values
    differ (different corpus/clustering); the layer grammar must not.
    """
    import json

    from big_data_virus_analysis_spark.plans.catalog import CATALOG

    from conftest import SMOKE_SF_DIR

    golden = json.load(open(f"{REF}/www/html/data.json"))

    def check_tree(tree, n_clusters):
        assert tree["name"] == "Main Container"
        assert len(tree["children"]) == n_clusters
        for cl in tree["children"]:
            assert re.match(r"Cluster #\d+$", cl["name"])
            class_names = [c["name"] for c in cl["children"]]
            # {Clean, Virus} in that order; a class absent from a
            # cluster may be omitted, but never reordered or renamed
            assert class_names == [
                n for n in ("Clean", "Virus") if n in class_names
            ] and class_names, class_names
            for cls in cl["children"]:
                for sample in cls["children"]:
                    assert sample["name"].startswith("Sample")
                    for leaf in sample["children"]:
                        assert set(leaf) == {"name", "size"}
                        assert isinstance(leaf["name"], str) and leaf["name"]
                        assert isinstance(leaf["size"], int) and leaf["size"] > 0

    check_tree(golden, 10)
    row = CATALOG["d3_export_tree"].spark(spark, SMOKE_SF_DIR).collect()
    assert len(row) == 1
    engine = json.loads(row[0]["tree_json"])
    # engine runs k=10 KMeans like the reference; empty clusters may
    # drop out of the tree on the tiny smoke corpus
    n_engine = len(engine["children"])
    assert 1 <= n_engine <= 10
    check_tree(engine, n_engine)


def test_output_txt_golden_invariants():
    """Invariants of the committed reference report golden
    (KmeansVirus.scala:123-136 → output.txt), asserted against the FILE
    so the grammar test can't drift from the artifact: 162 rows, 10
    clusters (ids 0..9), labels ⊆ {0.0, 1.0}, and every JSON payload a
    rank-descending {name,size} list."""
    import json

    lines = open(f"{REF}/output.txt").read().splitlines()
    lines = [ln for ln in lines if ln.strip()]
    assert len(lines) == 162
    clusters, labels = set(), set()
    for ln in lines:
        cluster, label, payload = ln.split(";", 2)
        clusters.add(int(cluster))
        labels.add(label)
        # the golden holds RAW windows paths ("C:\ProgramFiles") — the
        # reference string-built its JSON without escaping; tolerate it
        apis = json.loads(payload.replace("\\", "\\\\"))
        assert apis, "empty API list"
        sizes = [a["size"] for a in apis]
        assert sizes == sorted(sizes, reverse=True), "sizes not rank-descending"
        assert all(isinstance(a["name"], str) and a["name"] for a in apis)
    assert clusters == set(range(10))
    assert labels == {"0.0", "1.0"}


def test_report_lines_grammar_matches_golden_grammar(spark):
    """The engine's report_lines output must parse under the SAME
    grammar as the golden output.txt rows: cluster;label;json with
    rank-descending sizes."""
    import json

    from big_data_virus_analysis_spark.plans.catalog import CATALOG

    from conftest import SMOKE_SF_DIR

    rows = CATALOG["cluster_report_lines"].spark(spark, SMOKE_SF_DIR).collect()
    assert rows
    for r in rows:
        cluster, label, payload = r["line"].split(";", 2)
        assert 0 <= int(cluster) <= 9
        assert label in {"0.0", "1.0"}
        apis = json.loads(payload)
        sizes = [a["size"] for a in apis]
        assert sizes == sorted(sizes, reverse=True)


def test_reference_pipeline_self_golden(spark):
    """The END-TO-END chain (api_logs → IG rank → vectorize → seeded
    KMeans → report lines → d3 tree) is pinned by committed self-golden
    hashes: any change to tokenizer semantics, IG math, vocab ranking,
    vectorization, the seeded clustering, or the report/tree grammar
    moves one of these digests (KmeansVirus.scala:55-144 +
    exportJSON.php:5-54 end-to-end).  Regenerate by running the chain —
    determinism within an environment is asserted by the double run in
    the catalog smoke; the hash pins the WHOLE artifact, not samples."""
    import hashlib

    from big_data_virus_analysis_spark.operators.report import d3_tree
    from big_data_virus_analysis_spark.plans.catalog import (
        CATALOG,
        reference_pipeline_samples,
    )

    from conftest import SMOKE_SF_DIR

    df = CATALOG["reference_pipeline_report"].spark(spark, SMOKE_SF_DIR)
    rows = df.collect()
    assert df.columns == ["doc", "line"]
    assert len(rows) == 1587  # docs with >=1 vocab hit in the corpus
    lines = sorted(r["line"] for r in rows)
    digest = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    assert digest == (
        "c9d62a3b018d18cdee2fb326e019565a23100b5cd3738ee1e6a5202460c0023c"
    )

    tree = d3_tree(reference_pipeline_samples(spark)).collect()[0]["tree_json"]
    tdigest = hashlib.sha256(tree.encode()).hexdigest()
    assert tdigest == (
        "5896c0dc3cdd86f45a4eaed335676bd1b757cf7f1d5ad86d50128c375187fe79"
    )
