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


# ---------------------------------------------------------------------------
# trained-vocabulary tier (r9): fit_vocab + tokenize_ids_vocab


def _vocab_sql(v_content: int) -> str:
    pattern_sql = BPE_ISH_PATTERN.replace("'", "''")
    return rf"""
SELECT token, n,
       CAST(row_number() OVER (ORDER BY n DESC, token) + {N_SPECIAL - 1}
            AS INT) AS token_id
FROM (SELECT t AS token, count(*) AS n
      FROM (SELECT unnest(regexp_extract_all(coalesce(text, ''),
                          '{pattern_sql}')) AS t
            FROM docs)
      GROUP BY t)
ORDER BY n DESC, token
LIMIT {v_content}
"""


def test_fit_vocab_matches_duckdb(spark, sf_dir):
    from rdfproject_msc_spark.operators.tokenize import fit_vocab

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        map(tuple, fit_vocab(docs, vocab_size=2048).collect())
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW docs AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(map(tuple, con.execute(_vocab_sql(2048 - N_SPECIAL)).fetchall()))
    assert got == want
    ids = [r[2] for r in got]
    assert min(ids) == N_SPECIAL and max(ids) == N_SPECIAL + len(ids) - 1


def test_vocab_tokenize_matches_duckdb(spark, sf_dir):
    """The full vocab-join path vs a DuckDB lockstep-unnest + join twin
    (OOV → UNK), including empty-sequence docs."""
    from rdfproject_msc_spark.operators.tokenize import (
        UNK_ID,
        fit_vocab,
        tokenize_ids_vocab,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab = fit_vocab(docs, vocab_size=20)  # tiny: forces real OOV
    got = [
        (r["doc_id"], r["input_ids"])
        for r in tokenize_ids_vocab(docs, vocab, add_special=False)
        .orderBy("doc_id")
        .collect()
    ]
    pattern_sql = BPE_ISH_PATTERN.replace("'", "''")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW docs AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    con.execute(f"CREATE TABLE vocab AS {_vocab_sql(20 - N_SPECIAL)}")
    want = con.execute(
        rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(coalesce(text, ''), '{pattern_sql}')) AS t,
         generate_subscripts(regexp_extract_all(coalesce(text, ''),
                             '{pattern_sql}'), 1) AS pos
  FROM docs
),
seqs AS (
  SELECT doc_id, list(coalesce(v.token_id, {UNK_ID}) ORDER BY pos) AS ids
  FROM toks LEFT JOIN vocab v ON v.token = toks.t
  GROUP BY doc_id
)
SELECT d.doc_id, coalesce(s.ids, []) AS ids
FROM docs d LEFT JOIN seqs s ON s.doc_id = d.doc_id
ORDER BY d.doc_id
"""
    ).fetchall()
    assert got == [(r[0], r[1]) for r in want]
    flat = [i for _, ids in got for i in ids]
    assert UNK_ID in flat  # the small vocab really exercised the fallback


def test_vocab_and_hash_tiers_agree_on_covered_docs(spark, sf_dir):
    """On documents the vocabulary FULLY covers: no UNK anywhere, token
    counts equal the hash tier's (same pre-tokenizer), and joining the ids
    back through the vocab decodes the exact pre-token sequence."""
    from rdfproject_msc_spark.operators.tokenize import (
        UNK_ID,
        fit_vocab,
        tokenize_ids_vocab,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab = fit_vocab(docs, vocab_size=200_000)  # > distinct tokens: full cover
    out = tokenize_ids_vocab(docs, vocab, add_special=False)
    hash_out = tokenize_ids(docs, VOCAB, add_special=False).select(
        "doc_id", F.col("n_tokens").alias("n_hash")
    )
    j = out.join(hash_out, "doc_id")
    assert j.filter(F.col("n_tokens") != F.col("n_hash")).count() == 0
    assert (
        out.filter(F.array_contains("input_ids", UNK_ID)).count() == 0
    )
    # decode round-trip: ids → tokens reproduces the regex pre-tokens
    rev = {r["token_id"]: r["token"] for r in vocab.collect()}
    sample = out.orderBy("doc_id").limit(20).collect()
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.filter(
            F.col("doc_id").isin([s["doc_id"] for s in sample])
        ).collect()
    }
    import re

    for r in sample:
        want_toks = re.findall(BPE_ISH_PATTERN, texts[r["doc_id"]] or "")
        assert [rev[i] for i in r["input_ids"]] == want_toks


def test_vocab_specials_and_padding_contract(spark):
    from rdfproject_msc_spark.operators.tokenize import (
        fit_vocab,
        tokenize_ids_vocab,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma alpha"), (2, None)],
        "doc_id long, text string",
    )
    vocab = fit_vocab(docs, vocab_size=64)
    out = {
        r["doc_id"]: r
        for r in tokenize_ids_vocab(
            docs, vocab, max_len=4, pad_to_max=True
        ).collect()
    }
    assert out[1]["input_ids"][0] == BOS_ID
    assert out[1]["input_ids"][-1] == EOS_ID
    assert out[1]["n_tokens"] == 4  # BOS + 2 content (truncated) + EOS
    assert out[2]["input_ids"] == [BOS_ID, EOS_ID, PAD_ID, PAD_ID]
    assert out[2]["n_tokens"] == 2


def test_cli_tokenize_fit_vocab(spark, sf_dir, tmp_path):
    """CLI: fit + persist a trained vocab, tokenize through it; round-trip
    the persisted vocab with --use-vocab for identical ids."""
    import os

    from rdfproject_msc_spark.cli import main

    docs = os.path.join(sf_dir, "documents.parquet")
    out1, out2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    vdir = str(tmp_path / "vocab")
    assert main(["tokenize", "--docs", docs, "--out", out1,
                 "--vocab-size", "128", "--fit-vocab", vdir]) == 0
    assert main(["tokenize", "--docs", docs, "--out", out2,
                 "--use-vocab", vdir]) == 0
    a = sorted((r.doc_id, r.input_ids) for r in spark.read.parquet(out1).collect())
    b = sorted((r.doc_id, r.input_ids) for r in spark.read.parquet(out2).collect())
    assert a == b
    assert spark.read.parquet(vdir).count() == 61  # whole tiny-corpus vocab
