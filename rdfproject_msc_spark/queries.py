"""Reference-parity query shapes as parameterized DataFrame builders.

The reference hard-codes two benchmark SQL strings; here each shape is a
function over a TripleStore. All joins are declared declaratively — Catalyst
picks broadcast-hash vs sort-merge, and AQE re-plans at runtime.

Shapes (SURVEY.md §2.3/§2.5/§2.4):
  J1  path_2hop      3-way chained equi self-join (2-hop graph path)
  J2-4 split_join    Negative⋈Positive subquery + LEFT OUTER + post-filter
  U1  sign_union     Positive UNION ALL Negative recombination
  A1  count          result-size cross-check
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfproject_msc_spark.store import TripleStore


def path_2hop(
    store: TripleStore,
    s0: int | None,
    p0: int | None,
    p1: int | None,
    p2: int | None,
) -> DataFrame:
    """J1 — ``t JOIN t1 ON t.o=t1.s JOIN t2 ON t1.o=t2.s`` with constant
    subject/predicate filters per leg (PartitionQueryingSubject.java:130).

    Output: the 9 columns of the 3 legs, aliased s0,p0,o0,s1,p1,o1,s2,p2,o2
    (the reference's SELECT * with positional names made explicit).

    Each leg's equality filters sit directly on its scan, so they push into
    Parquet; the chain shuffles on o=s join keys (or broadcasts if a filtered
    leg is small — Catalyst/AQE decide from runtime stats).
    """

    def leg(i: int, s: int | None, p: int | None) -> DataFrame:
        df = store.table_for_subject(s)
        if s is not None:
            df = df.filter(F.col("s") == s)
        if p is not None:
            df = df.filter(F.col("p") == p)
        return df.select(
            F.col("s").alias(f"s{i}"), F.col("p").alias(f"p{i}"), F.col("o").alias(f"o{i}")
        )

    t0, t1, t2 = leg(0, s0, p0), leg(1, None, p1), leg(2, None, p2)
    return t0.join(t1, F.col("o0") == F.col("s1")).join(
        t2, F.col("o1") == F.col("s2")
    )


def split_join(
    store: TripleStore,
    p_neg: int,
    p_pos: int,
    p_post: int,
    s_neg: int | None = None,
) -> DataFrame:
    """J2+J3+J4 — the sign-split benchmark query
    (PartitionQueryingBRDSubject.java:152-157):

        SELECT Negative.Object FROM
          (SELECT Positive.Object FROM Negative
             JOIN Positive ON Negative.Object = Positive.Subject
            WHERE [Negative.Subject = s_neg AND]
                  Negative.Predicate = p_neg AND Positive.Predicate = p_pos) Table1
          LEFT OUTER JOIN Negative ON Negative.Subject = Table1.Object
        WHERE Negative.Predicate = p_post

    ``s_neg`` is the reference's bound inner subject
    (``Negative.Subject='-39'``, PartitionQueryingBRDSubject.java:154) —
    optional here, emitted as a typed literal rather than the reference's
    string-vs-int implicit cast.

    Semantics pinned bit-for-bit (SURVEY.md §5): the WHERE on the LEFT OUTER
    join's right side eliminates null-extended rows, making it an effective
    inner join — we still build it as left-outer + filter to preserve the
    reference's query, and a test asserts the equivalence.

    Output: single column ``obj`` (Negative.Object of the outer probe).
    """
    neg = store.negative
    pos = store.positive
    n1 = neg.filter(F.col("p") == p_neg)
    if s_neg is not None:
        n1 = n1.filter(F.col("s") == s_neg)
    inner = (
        n1.alias("n1")
        .join(pos.filter(F.col("p") == p_pos).alias("p1"), F.col("n1.o") == F.col("p1.s"))
        .select(F.col("p1.o").alias("t1_obj"))
    )
    outer = inner.join(
        neg.alias("n2"), F.col("n2.s") == F.col("t1_obj"), "left"
    ).filter(F.col("n2.p") == p_post)
    return outer.select(F.col("n2.o").alias("obj"))


def sign_union(store: TripleStore, p: int | None = None, o: int | None = None) -> DataFrame:
    """U1 — unbound-subject recombination: Positive UNION ALL Negative with
    the translator's bound-P/O filters (MyOpVisitorBase.java:106-123).
    Duplicates preserved (UNION ALL, never DISTINCT)."""
    # negative_raw, not df.filter(s<0): on a sign-partitioned persisted
    # store the former is a PartitionFilter (sign=0 directory pruning); the
    # latter would scan both partition directories and filter rows.
    pos, neg = store.positive, store.negative_raw
    out = pos.unionAll(neg)
    if p is not None:
        out = out.filter(F.col("p") == p)
    if o is not None:
        out = out.filter(F.col("o") == o)
    return out


def split_join_count(store: TripleStore, p_neg: int, p_pos: int, p_post: int) -> DataFrame:
    """A1 — COUNT cross-check of split_join (PartitionQueryingBRDSubject.java:165)."""
    return split_join(store, p_neg, p_pos, p_post).agg(
        F.count("*").alias("n")
    )
