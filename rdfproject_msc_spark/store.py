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
        broadcast_negative: bool = False,
        cache: bool = False,
        quads: DataFrame | None = None,
        graphs_disjoint: bool = False,
    ):
        """``broadcast_negative`` defaults to False: the reference broadcasts
        its Negative table unconditionally (MSc-scale assumption); at 100 TB
        an unconditional broadcast OOMs the day Negative is not small. AQE's
        runtime-stats join selection broadcasts it automatically when it IS
        small — the hint remains an explicit opt-in.

        ``cache``: persist the laid-out relation in executor memory. Right
        when the store is derived (view over other tables) and queried
        repeatedly — a 3-leg self-join otherwise re-derives the view once
        per leg. At corpus scale prefer ``write()`` + ``read()`` (disk
        layout) over caching 100 TB in RAM."""
        if layout not in LAYOUTS:
            raise ValueError(f"layout must be one of {LAYOUTS}")
        if cluster_by not in CLUSTER_KEYS:
            raise ValueError(f"cluster_by must be one of {CLUSTER_KEYS}")
        self.layout = layout
        self.cluster_by = cluster_by
        self.num_partitions = num_partitions
        self.broadcast_negative = broadcast_negative
        self._df = self._apply_clustering(triples.select("s", "p", "o"))
        if cache:
            self._df = self._df.persist()
        self._quads = (
            quads.select("g", "s", "p", "o") if quads is not None else None
        )
        # invariant: no (s, p, o) triple appears in more than one named
        # graph. The RDF-merge semantics of a multi-graph FROM then need
        # NO duplicate elimination, so the planner skips the merge's
        # .distinct() — one full shuffle of the selected triples saved
        # (the common case for partitioned loads, where each triple is
        # written to exactly one graph). NOT provable from a
        # partitionBy("g") layout alone — partitioning places each ROW in
        # one directory, but the same triple may be asserted under two g
        # values — so it is either (a) caller-declared here (trust-me),
        # or (b) PROVEN at write time: ``write_quads`` verifies it with
        # one keyed aggregation and persists a ``_GRAPHS_DISJOINT``
        # marker that ``attach_quads_path`` applies automatically (r8).
        self.graphs_disjoint = graphs_disjoint

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
    def _has_sign(self) -> bool:
        """True when backed by sign-partitioned Parquet (read path): the
        ``sign`` partition column is present and filters on it become
        Catalyst PartitionFilters — directory-level pruning, zero data read
        for the pruned side."""
        return "sign" in self._df.columns

    @staticmethod
    def _spo(df: DataFrame) -> DataFrame:
        return df.select("s", "p", "o")

    @property
    def df(self) -> DataFrame:
        """The full triple relation (Positive ∪ Negative when split)."""
        return self._spo(self._df)

    @property
    def positive(self) -> DataFrame:
        """Subjects ≥ 0 (P4; PartitionQueryingBRDSubject.java:100-104)."""
        if self._has_sign:
            return self._spo(self._df.filter(F.col("sign") == 1))
        return self._spo(self._df.filter(F.col("s") >= 0))

    @property
    def negative(self) -> DataFrame:
        """Subjects < 0 (P5; :120-124); broadcast-hinted only on opt-in."""
        neg = self._negative_raw
        return F.broadcast(neg) if self.broadcast_negative else neg

    @property
    def negative_raw(self) -> DataFrame:
        """Negative side WITHOUT the broadcast hint: the right view for
        plans that need the pruned scan (sign=0 PartitionFilter on a
        persisted store) but must leave the join strategy to AQE."""
        if self._has_sign:
            return self._spo(self._df.filter(F.col("sign") == 0))
        return self._spo(self._df.filter(F.col("s") < 0))

    # backwards-compatible private alias
    _negative_raw = negative_raw

    # -- named graphs (SPARQL 1.1 §13: dataset = default graph + named
    # graphs). The default graph stays the triple relation; named graphs
    # are a quad relation ``(g, s, p, o)`` with dictionary-encoded graph
    # names. GRAPH <iri> compiles to a g-equality filter — on a persisted
    # g-partitioned store that is directory-level partition pruning, the
    # same "write once, prune forever" story as the sign split.
    @property
    def quads(self) -> DataFrame:
        """The named-graph quad relation; raises when the store was built
        without one (a triples-only dataset has no named graphs)."""
        if self._quads is None:
            raise ValueError(
                "store has no named graphs: construct with quads=DataFrame"
                "(g, s, p, o) or attach_quads()"
            )
        return self._quads.select("g", "s", "p", "o")

    @property
    def has_quads(self) -> bool:
        return self._quads is not None

    def attach_quads(
        self, quads: DataFrame, graphs_disjoint: bool | None = None
    ) -> None:
        self._quads = quads.select("g", "s", "p", "o")
        if graphs_disjoint is not None:
            self.graphs_disjoint = graphs_disjoint

    def quads_for_graph(self, graph_id: int) -> DataFrame:
        """One named graph as a plain triple relation (the active graph of
        a constant ``GRAPH <iri>`` block): a pushdown-able g-equality —
        partition pruning on a ``write_quads`` layout."""
        return (
            self.quads.filter(F.col("g") == F.lit(int(graph_id)))
            .select("s", "p", "o")
        )

    def write_quads(self, path: str, verify_disjoint: bool = True) -> None:
        """Persist named graphs partitioned BY GRAPH: ``GRAPH <iri>``
        then reads exactly one directory. Right for the common
        tens-to-thousands-of-graphs regime; a dataset with millions of
        tiny graphs should range-cluster on ``g`` instead (same min/max
        row-group skipping, no directory explosion).

        ``verify_disjoint`` (r8): PROVE the graphs-disjoint invariant —
        no (s, p, o) in more than one graph — with one keyed aggregation
        (24-byte keys, map-side partial count_distinct) and persist a
        ``_GRAPHS_DISJOINT`` marker next to ``_SUCCESS`` when it holds.
        ``attach_quads_path`` then enables the planner's merge-skip fast
        path automatically: one write-time shuffle buys every future
        multi-graph FROM a shuffle-free RDF merge, and a wrong caller
        declaration can no longer silently change semantics. Opt out for
        pure-append pipelines that re-verify elsewhere."""
        self.quads.write.mode("overwrite").partitionBy("g").parquet(path)
        if not verify_disjoint:
            return
        shared = (
            self.quads.groupBy("s", "p", "o")
            .agg(F.count_distinct("g").alias("ng"))
            .filter(F.col("ng") > 1)
        )
        if shared.isEmpty():
            self._touch_marker(self.quads.sparkSession, path)

    _DISJOINT_MARKER = "_GRAPHS_DISJOINT"

    @classmethod
    def _marker_fs_path(cls, spark: SparkSession, path: str):
        """(FileSystem, Path) for the disjointness marker — the Hadoop FS
        API, so the proof travels with the data on HDFS/S3, not only on
        a local filesystem."""
        jpath = spark._jvm.org.apache.hadoop.fs.Path(
            path.rstrip("/") + "/" + cls._DISJOINT_MARKER
        )
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return fs, jpath

    @classmethod
    def _touch_marker(cls, spark: SparkSession, path: str) -> None:
        fs, jpath = cls._marker_fs_path(spark, path)
        fs.create(jpath, True).close()

    @classmethod
    def quads_disjoint_proven(cls, spark: SparkSession, path: str) -> bool:
        """True iff ``write_quads`` verified graph disjointness for this
        layout (the ``_GRAPHS_DISJOINT`` marker exists)."""
        fs, jpath = cls._marker_fs_path(spark, path)
        return bool(fs.exists(jpath))

    @staticmethod
    def read_quads(spark: SparkSession, path: str) -> DataFrame:
        """Open a ``write_quads`` layout without re-shuffling; pass to
        ``attach_quads`` / the ``quads=`` constructor arg (or use
        ``attach_quads_path`` to auto-apply the disjointness proof)."""
        return spark.read.parquet(path)

    def attach_quads_path(self, spark: SparkSession, path: str) -> None:
        """Open a ``write_quads`` layout AND apply its write-time
        disjointness proof: the planner's multi-graph-FROM fast path
        (skip the RDF merge's ``.distinct()``) turns on exactly when the
        marker proves it sound — no trust-me flag involved. An explicit
        caller declaration (``graphs_disjoint=True``) is still honored."""
        self._quads = self.read_quads(spark, path).select("g", "s", "p", "o")
        if self.quads_disjoint_proven(spark, path):
            self.graphs_disjoint = True

    def table_for_subject(self, subject_id: int | None) -> DataFrame:
        """Static sign routing (MyOpVisitorBase.java:82-86): a bound subject
        selects one side; an unbound subject needs both (U1's UNION ALL —
        here simply the unsplit relation, same rows). On a persisted store
        the routing is a partition filter — Catalyst prunes whole
        directories, the modern form of the reference's hand-routed SQL."""
        if self.layout == "single" or subject_id is None:
            return self.df
        return self.positive if subject_id >= 0 else self._negative_raw

    # -- registration (S6) -------------------------------------------------
    def register(self, spark: SparkSession, name: str = "table") -> None:
        """Temp views: ``table`` always; ``Positive``/``Negative`` when split."""
        self.df.createOrReplaceTempView(name)
        if self.layout == "sign_split":
            self.positive.createOrReplaceTempView("Positive")
            self._negative_raw.createOrReplaceTempView("Negative")

    # -- persistence --------------------------------------------------------
    def write(self, path: str) -> None:
        """Persist as Parquet — the "write once, prune forever" half of the
        100 TB story: ``sign`` becomes a Parquet partition column when split
        (directory pruning replaces the reference's hand-routed
        Positive/Negative SQL), and range clustering is preserved as
        row-group sort order (min/max stats → scan skipping on the cluster
        key)."""
        df = self._spo(self._df)
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
        """Open a persisted store WITHOUT re-shuffling: the on-disk layout IS
        the layout. The ``sign`` partition column (when present) is kept in
        the backing df so the split views prune at directory level."""
        df = spark.read.parquet(path)
        store = cls.__new__(cls)
        store.layout = layout
        store.cluster_by = cluster_by
        store.num_partitions = kwargs.get("num_partitions")
        store.broadcast_negative = kwargs.get("broadcast_negative", False)
        store._df = df  # already laid out on disk; no re-shuffle on read
        store._quads = None  # attach_quads(read_quads(...)) to add graphs
        store.graphs_disjoint = kwargs.get("graphs_disjoint", False)
        return store
