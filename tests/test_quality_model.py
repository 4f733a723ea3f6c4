"""Trained quality filter (operators/quality_model.py): exactness of
the closed-form diagonal-LDA trainer, the Python↔SQL double mirror the
oracle depends on, corruption-lane semantics, and the accuracy bar
that makes the model a real filter rather than a deterministic
curiosity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_pulumi_aws_snowflake_spark.functions import text as T
from etl_pulumi_aws_snowflake_spark.operators import quality_model as Q

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def model(docs):
    return Q.train_quality_lda(docs)


def test_training_is_partitioning_invariant(docs, model):
    again = Q.train_quality_lda(docs.repartition(7))
    assert again == model  # dataclass equality: ints AND doubles


def test_model_matches_duckdb_training_bitwise(model):
    """The oracle's SQL-computed model must equal the Spark-trained one
    on every fitted double — the fixed-order IEEE mirror contract."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    row = con.execute(
        "WITH " + Q.quality_model_ctes_duck("documents")
        + " SELECT * FROM qweights"
    ).df().iloc[0]
    for i, fm in enumerate(model):
        assert int(row["np"]) == fm.n_pos and int(row["nn"]) == fm.n_neg
        assert int(row[f"sp{i + 1}"]) == fm.sum_pos
        assert int(row[f"ssn{i + 1}"]) == fm.sumsq_neg
        # bitwise double equality, not approx — the hash depends on it
        assert float(row[f"mp{i + 1}"]) == fm.mu_pos, fm.name
        assert float(row[f"mn{i + 1}"]) == fm.mu_neg, fm.name
        assert float(row[f"v{i + 1}"]) == fm.pooled_var, fm.name
        assert float(row[f"w{i + 1}"]) == fm.weight, fm.name


def test_classifier_accuracy_on_labeled_set(spark, docs, model):
    """≥95% on the synthetic labeled set (measured ~0.97 at every sf).
    Both corruption lanes must be mostly caught — a one-lane model
    would still clear a global bar at 0.75."""
    margin = Q.quality_margin(model)
    n = docs.count()
    pos_ok = docs.filter(margin > 0).count()
    corrupted = docs.select(
        "doc_id", F.expr(T.corrupt_text().spark).alias("text")
    )
    neg = corrupted.withColumn("m", Q.quality_margin(model))
    neg_even_ok = neg.filter((F.col("doc_id") % 2 == 0) & (F.col("m") <= 0))
    neg_odd_ok = neg.filter((F.col("doc_id") % 2 == 1) & (F.col("m") <= 0))
    acc = (pos_ok + neg_even_ok.count() + neg_odd_ok.count()) / (2 * n)
    assert acc >= 0.95, acc
    assert neg_even_ok.count() >= 0.9 * (n // 2)   # devowel lane
    assert neg_odd_ok.count() >= 0.9 * (n // 2)    # boiler lane


def test_corruption_lanes_move_the_right_features(spark):
    df = spark.createDataFrame(
        [(0, "the cat sat on the mat and ran off"),
         (1, "the cat sat on the mat and ran off")],
        "doc_id long, text string",
    )
    ct = df.select(
        "doc_id", F.expr(T.corrupt_text().spark).alias("text")
    )
    rows = {r["doc_id"]: r for r in ct.select(
        "doc_id",
        F.expr(T.vowel_permille().spark).alias("vow"),
        F.expr(T.distinct_permille().spark).alias("dist"),
        F.expr(T.dup_bigram_permille().spark).alias("dupbg"),
        "text",
    ).collect()}
    assert rows[0]["vow"] == 0                      # devowel lane
    assert rows[0]["text"] == "thz czt szt zn thz mzt znd rzn zff"
    assert rows[1]["text"] == "the cat the cat the cat the cat"
    assert rows[1]["dist"] == 250                   # 2 distinct / 8
    assert rows[1]["dupbg"] > 500                   # boilerplate lane


def test_single_word_and_empty_text_are_guarded(spark):
    df = spark.createDataFrame(
        [(1, "word"), (3, "")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in df.select(
        "doc_id",
        F.expr(T.corrupt_text().spark).alias("ct"),
        F.expr(T.stopword_permille().spark).alias("stp"),
        F.expr(T.dup_bigram_permille().spark).alias("dbg"),
    ).collect()}
    assert rows[1]["ct"] == "word word"  # least(2, size) fallback
    assert rows[3]["ct"] == ""
    assert rows[3]["stp"] == 0 and rows[3]["dbg"] == 0


def test_trainer_rejects_empty_class(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="both classes"):
        Q.train_quality_lda(empty)


def test_margin_is_scan_side_codegen(spark, docs, model):
    """Scoring must stay a per-row projection: no exchange, no join —
    the plan the 100 TB composition inherits."""
    scored = docs.select("doc_id", Q.quality_margin(model).alias("m"))
    plan = scored._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Exchange" not in plan
    assert "Join" not in plan
