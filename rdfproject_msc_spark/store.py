"""TripleStore: physical layouts as a first-class tuning knob.

The reference's four drivers are four hard-coded (layout × cluster-key)
experiments:

    single table, range-clustered by Subject    PartitionQueryingSubject.java:100
    single table, range-clustered by Predicate  PartitionQueryingPredicate.java:100
    sign-split,  Positive sorted by Subject     PartitionQueryingBRDSubject.java:100-146
    sign-split,  Positive sorted by Predicate   PartitionQueryingBRDPredicate.java:100-146

Here they are one parameterized class. The Spark-first re-expression:

- range clustering = ``repartitionByRange(n, key).sortWithinPartitions(key)``;
  persisted as Parquet this yields min/max row-group stats → scan skipping for
  key lookups, which is what the reference's sortByKey was buying.
- sign split = a ``sign`` partition column (Parquet ``partitionBy``), so
  Catalyst partition pruning replaces the translator's hand-routed
  Positive/Negative SQL (MyOpVisitorBase.java:82-86). In-memory, the split
  views are plain filters — Catalyst pushes them into the scan.
- the Negative side is typically small (reference broadcasts it —
  intent at PartitionQueryingBRDSubject.java:133, though broadcasting an RDD
  handle was a no-op); we expose a broadcast hint on the negative view.

At 100 TB: the store is written once as sign-partitioned, range-clustered
Parquet; every query then gets partition pruning + row-group skipping free,
and predicate-key skew (few distinct predicates → giant partitions) is
handled by AQE skew-join splitting rather than a fixed partition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LAYOUTS = ("single", "sign_split")
CLUSTER_KEYS = ("s", "p", None)


class TripleStore:
    """Dictionary-encoded triples ``(s, p, o)`` with a pluggable physical layout."""

    def __init__(
        self,
        triples: DataFrame,
        layout: str = "single",
        cluster_by: str | None = None,
        num_partitions: int | None = None,
        broadcast_negative: bool = True,
    ):
        if layout not in LAYOUTS:
            raise ValueError(f"layout must be one of {LAYOUTS}")
        if cluster_by not in CLUSTER_KEYS:
            raise ValueError(f"cluster_by must be one of {CLUSTER_KEYS}")
        self.layout = layout
        self.cluster_by = cluster_by
        self.num_partitions = num_partitions
        self.broadcast_negative = broadcast_negative
        self._df = self._apply_clustering(triples.select("s", "p", "o"))

    def _apply_clustering(self, df: DataFrame) -> DataFrame:
        if self.cluster_by is None:
            return df
        n = self.num_partitions
        clustered = (
            df.repartitionByRange(n, self.cluster_by)
            if n
            else df.repartitionByRange(self.cluster_by)
        )
        return clustered.sortWithinPartitions(self.cluster_by)

    # -- views ------------------------------------------------------------
    @property
    def df(self) -> DataFrame:
        """The full triple relation (Positive ∪ Negative when split)."""
        return self._df

    @property
    def positive(self) -> DataFrame:
        """Subjects ≥ 0 (P4; PartitionQueryingBRDSubject.java:100-104)."""
        return self._df.filter(F.col("s") >= 0)

    @property
    def negative(self) -> DataFrame:
        """Subjects < 0 (P5; :120-124), broadcast-hinted as the small side."""
        neg = self._df.filter(F.col("s") < 0)
        return F.broadcast(neg) if self.broadcast_negative else neg

    def table_for_subject(self, subject_id: int | None) -> DataFrame:
        """Static sign routing (MyOpVisitorBase.java:82-86): a bound subject
        selects one side; an unbound subject needs both (U1's UNION ALL —
        here simply the unsplit relation, same rows)."""
        if self.layout == "single" or subject_id is None:
            return self._df
        return self.positive if subject_id >= 0 else self._df.filter(F.col("s") < 0)

    # -- registration (S6) -------------------------------------------------
    def register(self, spark: SparkSession, name: str = "table") -> None:
        """Temp views: ``table`` always; ``Positive``/``Negative`` when split."""
        self._df.createOrReplaceTempView(name)
        if self.layout == "sign_split":
            self.positive.createOrReplaceTempView("Positive")
            self._df.filter(F.col("s") < 0).createOrReplaceTempView("Negative")

    # -- persistence --------------------------------------------------------
    def write(self, path: str) -> None:
        """Persist as Parquet: sign partition column when split (pruning),
        range clustering preserved as row-group sort order (skipping)."""
        df = self._df
        if self.layout == "sign_split":
            df = df.withColumn("sign", (F.col("s") >= 0).cast("int"))
            df.write.mode("overwrite").partitionBy("sign").parquet(path)
        else:
            df.write.mode("overwrite").parquet(path)

    @classmethod
    def read(
        cls,
        spark: SparkSession,
        path: str,
        layout: str = "single",
        cluster_by: str | None = None,
        **kwargs,
    ) -> "TripleStore":
        df = spark.read.parquet(path).select("s", "p", "o")
        store = cls.__new__(cls)
        store.layout = layout
        store.cluster_by = cluster_by
        store.num_partitions = kwargs.get("num_partitions")
        store.broadcast_negative = kwargs.get("broadcast_negative", True)
        store._df = df  # already laid out on disk; no re-shuffle on read
        return store
