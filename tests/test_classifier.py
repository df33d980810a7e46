"""Weak-label NB quality classifier (analytics/classifier.py).

The registry entry is oracle-gated by test_full_registry; these pin
what the hash can't: the frozen artifact matches a fresh training run
(staleness guard, like the codebook pins), the full-Bernoulli fit
actually distills the heuristic (the present-only shortcut scored at
CHANCE on this corpus — below 0.5 — because the signal lives in absent
tokens), and the integer-micro freeze keeps scoring order-free.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ph_ee_nats_importer_rdbms_spark.analytics import classifier as clf


def test_fit_weights_is_full_bernoulli():
    # one token, present in every positive, absent in every negative:
    # a doc WITH it must score positive, a doc WITHOUT it negative —
    # which requires the absence evidence the multinomial shortcut drops
    stats = [("tok", 10, 0)]
    m = clf.fit_weights(stats, n_pos=10, n_neg=10)
    with_tok = m["prior_micros"] + m["weights"]["tok"]
    without_tok = m["prior_micros"]
    assert with_tok > 0
    assert without_tok < 0
    # exact algebra: prior folds the absent term, weight is the delta
    p_pos, p_neg = 11 / 12, 1 / 12
    absent = math.log((1 - p_pos) / (1 - p_neg))
    present = math.log(p_pos / p_neg)
    assert m["prior_micros"] == round(
        (math.log(11 / 11) + absent) * 1_000_000
    )
    assert m["weights"]["tok"] == round((present - absent) * 1_000_000)


def test_weights_are_integer_micros():
    m = clf.model_for("/root/testdata/sf0.001")
    assert m["weights"], "trained artifact missing"
    assert all(isinstance(v, int) for v in m["weights"].values())
    assert isinstance(m["prior_micros"], int)


def test_artifact_matches_fresh_training(spark, sf_dir):
    """Freshness pin: re-running the distributed sufficient-statistics
    pass + fit reproduces the checked-in model exactly (the artifact
    can't silently drift from the training code)."""
    fresh = clf.train_nb_for_sf(spark, sf_dir)
    frozen = clf.model_for(sf_dir)
    assert fresh["weights"] == frozen["weights"]
    assert fresh["prior_micros"] == frozen["prior_micros"]


def test_distillation_beats_chance(spark, sf_dir):
    df = clf.q_quality_classifier(spark, sf_dir)
    agree = df.agg(
        F.avg((F.col("predicted") == F.col("weak_label")).cast("double"))
    ).first()[0]
    assert agree >= 0.7, f"distillation agreement {agree:.3f}"


def test_training_is_one_action(spark, sf_dir, monkeypatch):
    """Job budget (VERDICT r10 task #6): the trainer's sufficient
    statistics come from ONE distributed action over ONE corpus scan —
    the class totals ride the same df aggregate as the token features
    (the sentinel row), so the old separate class-totals ``first()``
    must never reappear."""
    import pyspark.sql.classic.dataframe as cdf

    actions: list[str] = []
    orig_collect, orig_first = cdf.DataFrame.collect, cdf.DataFrame.first

    def rec_collect(self, *a, **k):
        actions.append("collect")
        return orig_collect(self, *a, **k)

    def rec_first(self, *a, **k):
        actions.append("first")
        return orig_first(self, *a, **k)

    monkeypatch.setattr(cdf.DataFrame, "collect", rec_collect, raising=True)
    monkeypatch.setattr(cdf.DataFrame, "first", rec_first, raising=True)
    stats, n_pos, n_neg = clf.class_doc_frequencies(spark, sf_dir)
    assert actions == ["collect"], (
        f"NB training ran {actions} — budget is exactly one collect "
        "(the df head carrying the totals sentinel)"
    )
    assert stats and n_pos > 0 and n_neg > 0
    assert all(t != clf._TOTALS_SENTINEL for t, _, _ in stats)
