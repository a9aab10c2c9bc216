"""Quality-classifier trainer (operators/classifier.py): determinism
(the property the literal-inlined oracle depends on), label parity
with the SQL gopher rules, separation on a constructed sample, and —
since r15 — bit-for-bit parity between the numpy trainer and the
INDEPENDENT pure-Python twin the DuckDB oracles retrain with
(train_quality_classifier_py; both quantize (w, b) to 9dp per
iteration, the operators/kmeans_oracle discipline, so
accumulation-order divergence cannot compound across iterations)."""

from __future__ import annotations

import pytest

from env_event_stream_spark.operators import classifier as C

SCALES = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
          "/root/testdata/sf0.1"]


GOOD = (
    "the quick brown fox jumps over a lazy dog and runs far away "
    "with the pack of hounds chasing it through fields of grain"
)
BAD = "x1 9$$ !!"  # short, low-alpha, no stopword


def test_trainer_is_deterministic():
    sample = [(i, GOOD if i % 3 else BAD + str(i)) for i in range(60)]
    w1, b1 = C.train_quality_classifier(sample)
    w2, b2 = C.train_quality_classifier(list(reversed(sample)))
    assert w1 == w2 and b1 == b2  # bit-identical, caller order ignored


@pytest.mark.parametrize("sf", SCALES)
def test_trainer_parity_with_pure_twin_on_testdata(sf):
    """The exact sample contract _qc_model_cached uses (pyarrow read,
    doc_id order, cap 1000): numpy trainer == pure-Python twin,
    bit for bit, at every testdata scale."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    )
    rows = sorted(
        zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()),
        key=lambda r: int(r[0]),
    )[:1000]
    assert C.train_quality_classifier(rows) == \
        C.train_quality_classifier_py(rows)


def test_trainer_parity_constructed_and_order_invariant():
    sample = [(i, GOOD if i % 3 else BAD + str(i)) for i in range(60)]
    a = C.train_quality_classifier(sample)
    assert a == C.train_quality_classifier_py(sample)
    # both trainers sort by doc_id internally — caller order ignored
    assert a == C.train_quality_classifier_py(list(reversed(sample)))


def test_gopher_label_python_twin():
    assert C.gopher_label(GOOD) is True
    assert C.gopher_label(BAD) is False
    assert C.gopher_label("") is False
    assert C.gopher_label("the " * 5) is False  # < 10 tokens
    # no stopword: fails despite length/alpha
    assert C.gopher_label("alpha beta gamma delta epsilon zeta eta "
                          "theta iota kappa lambada") is False


def test_classifier_separates_constructed_sample():
    sample = [
        (i, GOOD + f" extra{i}") if i % 2 else (i, BAD + str(i))
        for i in range(100)
    ]
    w, b = C.train_quality_classifier(sample)

    def score(text):
        tk = C.tokenize_py(text)
        z = 0.0
        cnts: dict[int, int] = {}
        for t in tk:
            k = C.bucket_of(t)
            cnts[k] = cnts.get(k, 0) + 1
        for k in sorted(cnts):
            z += w[k] * cnts[k]
        z /= len(tk)
        fi, fm, fa, fs = C.surface_features(text)
        return (
            z + w[C.N_BUCKETS] * fi + w[C.N_BUCKETS + 1] * fm
            + w[C.N_BUCKETS + 2] * fa + w[C.N_BUCKETS + 3] * fs + b
        )

    assert score(GOOD + " extra7") > 0
    assert score(BAD + "77") < 0


def test_surface_features_are_ratio_exact():
    fi, fm, fa, fs = C.surface_features("the cat of abc")
    assert fi == 1.0 / 4
    assert fm == (11 / 4) / 10.0
    assert fa == 11 * 1.0 / 14
    assert fs == 1.0


def test_rater_agreement_cells_are_consistent(spark, sf_dir):
    # structural contract: one shared n, agreement bounded by n,
    # agree_ppm floor-consistent, kappa in [-1, 1] when defined, and
    # kappa == 1 exactly when the pair agrees everywhere with
    # non-degenerate chance agreement; the known verdict on this
    # synthetic corpus — the classifier mirrors the rules it was
    # trained on — must surface as the rules/classifier pair having
    # the max agreement of the three
    from env_event_stream_spark.llm_queries import (
        doc_quality_rater_agreement,
    )

    rows = doc_quality_rater_agreement(spark, sf_dir).collect()
    assert len(rows) == 3
    ns = {r["n"] for r in rows}
    assert len(ns) == 1 and ns.pop() > 0
    by = {(r["rater_a"], r["rater_b"]): r for r in rows}
    assert set(by) == {
        ("rules", "classifier"),
        ("rules", "score"),
        ("classifier", "score"),
    }
    for r in rows:
        assert 0 <= r["n_agree"] <= r["n"]
        assert r["agree_ppm"] == r["n_agree"] * 1_000_000 // r["n"]
        if r["kappa"] is not None:
            assert -1.0 <= r["kappa"] <= 1.0
        if r["n_agree"] == r["n"] and r["kappa"] is not None:
            assert r["kappa"] == 1.0
    rc = by[("rules", "classifier")]
    assert rc["n_agree"] == max(r["n_agree"] for r in rows)


def test_quality_mixture_recipe_invariants(spark, sf_dir):
    # structural contract: the vote-scaled weight never exceeds the
    # domain target, votes=0 strata keep nothing, votes=3 strata
    # sample at exactly the domain rate (eff == w100), the effective
    # weight is monotone in votes within a source, and the strata of
    # a source partition its doc_mixture_sample population
    from env_event_stream_spark.llm_queries import (
        doc_mixture_sample,
        doc_quality_mixture,
    )

    rows = doc_quality_mixture(spark, sf_dir).collect()
    assert rows
    mix = {
        r["source"]: r for r in doc_mixture_sample(spark, sf_dir).collect()
    }
    per_source: dict[str, list] = {}
    for r in rows:
        assert 0 <= r["votes"] <= 3
        assert 0 <= r["n_kept"] <= r["n_docs"]
        target = mix[r["source"]]["target_weight"]
        assert r["eff_weight"] <= target
        if r["votes"] == 0:
            assert r["n_kept"] == 0 and r["kept_rate"] == 0.0
        if r["votes"] == 3:
            assert r["eff_weight"] == target
        per_source.setdefault(r["source"], []).append(r)
    for source, strata in per_source.items():
        assert sum(r["n_docs"] for r in strata) == mix[source]["n_docs"]
        by_votes = sorted(strata, key=lambda r: r["votes"])
        effs = [r["eff_weight"] for r in by_votes]
        assert effs == sorted(effs)
