"""Multinomial Naive Bayes classifier (operators/classify.py).

Hand-computed posteriors on a planted corpus, OOV handling, vocabulary
cap determinism, and the argmax tiebreak."""

import math

import pytest

from confluent_data_ingestion_spark.operators.classify import nb_score, nb_train


@pytest.fixture(scope="module")
def planted(spark):
    # class "a": tokens heavily "x"; class "b": heavily "y"; shared "z"
    train = spark.createDataFrame(
        [
            (1, "a", "x x z"),
            (2, "a", "x z"),
            (3, "b", "y y z"),
            (4, "b", "y z"),
        ],
        "doc_id long, lang string, text string",
    )
    return train


def _fit(train, max_vocab=500):
    return nb_train(train, label_col="lang", text_col="text", max_vocab=max_vocab)


def test_nb_train_model_values(planted):
    dense, classes = _fit(planted)
    # vocab = {x, y, z}, V=3; class a tokens: x=3, z=2 (5 total); b: y=3, z=2
    rows = {(r["label"], r["w"]): float(r["loglik"]) for r in dense.collect()}
    assert rows[("a", "x")] == round(math.log(4 / 8), 6)  # (3+1)/(5+3)
    assert rows[("a", "z")] == round(math.log(3 / 8), 6)
    assert rows[("a", "y")] == round(math.log(1 / 8), 6)  # unseen-in-class
    assert rows[("b", "y")] == round(math.log(4 / 8), 6)
    cls = {r["label"]: r for r in classes.collect()}
    assert float(cls["a"]["log_prior"]) == round(math.log(0.5), 6)
    assert float(cls["a"]["unk_loglik"]) == round(math.log(1 / 8), 6)


def test_nb_score_argmax_and_posterior(spark, planted):
    dense, classes = _fit(planted)
    test = spark.createDataFrame(
        [(10, "x x y"), (11, "y z"), (12, "q q q")],  # 12 is fully OOV
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in nb_score(test, dense, classes).collect()}
    assert out[10]["pred_label"] == "a"
    expect = round(
        round(math.log(0.5), 6)
        + 2 * round(math.log(4 / 8), 6)
        + round(math.log(1 / 8), 6),
        6,
    )
    assert out[10]["log_posterior"] == pytest.approx(expect, abs=1e-9)
    assert out[11]["pred_label"] == "b"
    assert 12 not in out  # OOV-only docs drop identically on every engine


def test_nb_tiebreak_is_label_asc(spark, planted):
    dense, classes = _fit(planted)
    # "z" scores identically under both classes (2+1)/(5+3); priors equal
    test = spark.createDataFrame([(20, "z z")], "doc_id long, text string")
    out = nb_score(test, dense, classes).collect()
    assert out[0]["pred_label"] == "a"  # score tie -> label asc


def test_nb_vocab_cap_deterministic(spark):
    # 6 distinct tokens, cap at 2: keeps the 2 most frequent; count ties
    # break token-asc ("b" over "c")
    train = spark.createDataFrame(
        [(1, "a", "t t t b b c c d e f")],
        "doc_id long, lang string, text string",
    )
    dense, _ = nb_train(train, label_col="lang", max_vocab=2)
    kept = sorted({r["w"] for r in dense.collect()})
    assert kept == ["b", "t"]


def test_nb_empty_words_ignored(spark):
    # consecutive spaces produce empty split tokens; they must not enter
    # vocabulary or scoring (parity with the SQL oracle's w <> '' filter)
    train = spark.createDataFrame(
        [(1, "a", "x  x"), (2, "b", "y y")],
        "doc_id long, lang string, text string",
    )
    dense, classes = nb_train(train, label_col="lang")
    assert {r["w"] for r in dense.collect()} == {"x", "y"}
    test = spark.createDataFrame([(9, "  x  ")], "doc_id long, text string")
    out = nb_score(test, dense, classes).collect()
    assert len(out) == 1 and out[0]["pred_label"] == "a"


def test_nb_vocab_empty_class_keeps_prior(spark):
    """A class whose every token falls outside the capped vocabulary must
    survive training with its prior and the pure-Laplace model (loglik =
    unk = ln(1/V)) — the round-10 review found the inner ct join dropping
    such classes silently."""
    # cap 2 -> vocab {"t","u"} (class a's tokens); class b's tokens are
    # all rarer and fall outside the vocabulary entirely
    train = spark.createDataFrame(
        [
            (1, "a", "t t t u u u"),
            (2, "b", "p q r"),
        ],
        "doc_id long, lang string, text string",
    )
    dense, classes = nb_train(train, label_col="lang", max_vocab=2)
    cls = {r["label"]: r for r in classes.collect()}
    assert set(cls) == {"a", "b"}  # b not dropped
    assert float(cls["b"]["log_prior"]) == round(math.log(1 / 2), 6)
    # class_tokens = 0 -> every vocab token scores ln(1/(0+V)) = ln(1/2)
    assert float(cls["b"]["unk_loglik"]) == round(math.log(1 / 2), 6)
    rows = {(r["label"], r["w"]): float(r["loglik"]) for r in dense.collect()}
    assert rows[("b", "t")] == round(math.log(1 / 2), 6)
    assert rows[("b", "u")] == round(math.log(1 / 2), 6)
    # and b is predictable: equal likelihoods + equal priors tie -> "a"
    # by label asc, but a b-leaning prior flips it
    out = nb_score(
        spark.createDataFrame([(9, "t u")], "doc_id long, text string"),
        dense, classes,
    ).collect()
    assert len(out) == 1
