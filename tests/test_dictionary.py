"""Dictionary invariants: id-0 sentinel reservation, uniqueness validation,
bounded constant lookup errors."""

from __future__ import annotations

import pytest

from rdfproject_msc_spark.dictionary import Dictionary, DictionaryError


def test_validate_accepts_clean(spark):
    d = Dictionary(spark.createDataFrame([(1, "a"), (2, "b")], "id long, term string"))
    d.validate()  # no raise


def test_validate_rejects_zero_id(spark):
    d = Dictionary(spark.createDataFrame([(0, "a")], "id long, term string"))
    with pytest.raises(DictionaryError, match="reserved id 0"):
        d.validate()


def test_validate_rejects_duplicate_ids(spark):
    d = Dictionary(
        spark.createDataFrame([(1, "a"), (1, "b")], "id long, term string")
    )
    with pytest.raises(DictionaryError, match="ids are not unique"):
        d.validate()


def test_validate_rejects_duplicate_terms(spark):
    d = Dictionary(
        spark.createDataFrame([(1, "a"), (2, "a")], "id long, term string")
    )
    with pytest.raises(DictionaryError, match="terms are not unique"):
        d.validate()


def test_encode_terms_missing_raises(spark):
    d = Dictionary(spark.createDataFrame([(1, "a")], "id long, term string"))
    with pytest.raises(DictionaryError, match="not in dictionary.*'zzz'"):
        d.encode_terms(["a", "zzz"])


def test_decode_unknown_id_is_null(spark):
    d = Dictionary(spark.createDataFrame([(1, "a")], "id long, term string"))
    df = spark.createDataFrame([(1,), (999,)], "x long")
    got = {r.x for r in d.decode(df, ["x"]).collect()}
    assert got == {"a", None}
