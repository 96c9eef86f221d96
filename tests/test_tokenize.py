"""Hash-vocab tokenization (operators/tokenize.py) vs an exact DuckDB twin,
plus the special-token / truncation / padding contracts."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from rdfproject_msc_spark.operators.textstats import BPE_ISH_PATTERN
from rdfproject_msc_spark.operators.tokenize import (
    BOS_ID,
    EOS_ID,
    N_SPECIAL,
    PAD_ID,
    token_ids,
    tokenize_ids,
)

VOCAB = 4096


def _ids_sql() -> str:
    n_buckets = VOCAB - N_SPECIAL
    pattern_sql = BPE_ISH_PATTERN.replace("'", "''")
    hex6 = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(t), {1 + i}, 1)) - 1)"
        f" * {16 ** (5 - i)}"
        for i in range(6)
    )
    return rf"""
SELECT doc_id,
       list_transform(regexp_extract_all(coalesce(text, ''),
                      '{pattern_sql}'),
                      t -> CAST(({hex6}) % {n_buckets} + {N_SPECIAL} AS INT))
           AS input_ids
FROM docs
ORDER BY doc_id
"""


def test_matches_duckdb_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [
        (r["doc_id"], r["input_ids"])
        for r in tokenize_ids(docs, VOCAB, add_special=False)
        .orderBy("doc_id")
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW docs AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = [(r[0], r[1]) for r in con.execute(_ids_sql()).fetchall()]
    assert got == want
    # ids stay inside the content range
    flat = [i for _, ids in got for i in ids]
    assert flat and min(flat) >= N_SPECIAL and max(flat) < VOCAB


def test_ids_agree_with_bpe_token_count(spark, sf_dir):
    """The id sequence budgets EXACTLY like token_count_bpe — same
    pre-tokenizer, so n_tokens (no specials) == n_bpe_tokens."""
    from rdfproject_msc_spark.operators.textstats import token_count_bpe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    joined = (
        tokenize_ids(docs, VOCAB, add_special=False)
        .join(
            docs.select(
                "doc_id", token_count_bpe(F.col("text")).alias("n_bpe")
            ),
            "doc_id",
        )
        .filter(F.col("n_tokens") != F.col("n_bpe"))
    )
    assert joined.count() == 0


def test_special_tokens_and_truncation(spark):
    df = spark.createDataFrame(
        [(1, "one two three four five six seven eight")],
        "doc_id long, text string",
    )
    row = tokenize_ids(df, VOCAB, max_len=6).head()
    ids = row["input_ids"]
    assert len(ids) == 6 and row["n_tokens"] == 6
    assert ids[0] == BOS_ID and ids[-1] == EOS_ID
    assert all(i >= N_SPECIAL for i in ids[1:-1])
    # truncation is a prefix: the first 4 content ids survive
    full = tokenize_ids(df, VOCAB, add_special=False).head()["input_ids"]
    assert ids[1:-1] == full[:4]


def test_padding_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, "short text."), (2, None), (3, "")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in tokenize_ids(df, VOCAB, max_len=8, pad_to_max=True).collect()
    }
    for d, r in rows.items():
        assert len(r["input_ids"]) == 8
    assert rows[2]["input_ids"][:2] == [BOS_ID, EOS_ID]
    assert rows[2]["n_tokens"] == 2
    assert set(rows[2]["input_ids"][2:]) == {PAD_ID}
    assert rows[3]["input_ids"] == rows[2]["input_ids"]
    # deterministic: same text → same ids
    again = {
        r["doc_id"]: r["input_ids"]
        for r in tokenize_ids(df, VOCAB, max_len=8, pad_to_max=True).collect()
    }
    assert again == {d: r["input_ids"] for d, r in rows.items()}


def test_parameter_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="vocab_size"):
        tokenize_ids(df, 4)
    with pytest.raises(ValueError, match="max_len"):
        tokenize_ids(df, VOCAB, max_len=1, add_special=True)
    with pytest.raises(ValueError, match="pad_to_max"):
        tokenize_ids(df, VOCAB, pad_to_max=True)


def test_plan_is_codegen_only(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = tokenize_ids(docs, VOCAB, max_len=128, pad_to_max=True)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert "Python" not in final
    assert "Exchange" not in final
