"""Naive Bayes quality classifier (operators/classifier.py)."""

import math

from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.operators.classifier import (
    nb_classify,
    train_nb_classifier,
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _model(spark):
    pos = _frame(
        spark,
        [(1, "clean prose sentence with verbs"),
         (2, "another clean well formed sentence")],
    )
    neg = _frame(
        spark,
        [(10, "buy buy cheap cheap pills"), (11, "cheap casino pills click")],
    )
    return train_nb_classifier(pos, neg)


class TestClassifier:
    def test_separates_classes(self, spark):
        model = _model(spark)
        scored = {
            r["doc_id"]: r
            for r in nb_classify(
                _frame(
                    spark,
                    [(100, "a clean sentence with prose"),
                     (101, "cheap cheap pills casino")],
                ),
                model,
            ).collect()
        }
        assert scored[100]["llr"] > 0 > scored[101]["llr"]
        assert scored[100]["prob"] > 0.5 > scored[101]["prob"]
        assert scored[100]["n_tokens"] == 5

    def test_empty_doc_scores_prior_only(self, spark):
        model = _model(spark)
        got = nb_classify(
            _frame(spark, [(1, ""), (2, None)]), model
        ).collect()
        prior = model["scalars"].collect()[0]["prior_llr"]
        for r in got:
            assert r["n_tokens"] == 0
            assert abs(r["llr"] - round(prior, 6)) < 1e-9
            assert abs(r["prob"] - 1.0 / (1.0 + math.exp(-r["llr"]))) < 1e-3

    def test_unseen_tokens_use_default(self, spark):
        model = _model(spark)
        (r,) = nb_classify(
            _frame(spark, [(1, "zzz qqq")]), model
        ).collect()
        sc = model["scalars"].collect()[0]
        want = round(sc["prior_llr"] + 2 * sc["default_llr"], 6)
        assert abs(r["llr"] - want) < 1e-9

    def test_deterministic_across_partitionings(self, spark):
        docs = _frame(
            spark,
            [(i, f"word{i % 7} cheap clean token{i % 3}") for i in range(60)],
        )
        pos = docs.filter(F.col("doc_id") % 2 == 0)
        neg = docs.filter(F.col("doc_id") % 2 == 1)
        a = nb_classify(docs.repartition(1), train_nb_classifier(pos, neg))
        b = nb_classify(docs.repartition(13), train_nb_classifier(
            pos.repartition(7), neg.repartition(3)))
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_scoring_plan_broadcasts_model(self, spark):
        model = _model(spark)
        plan = (
            nb_classify(_frame(spark, [(1, "x")]), model)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
