"""rdfproject_msc_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference (nkoutroumanis/RdfProject-Msc): dictionary-encoded RDF triples in
DataFrames, graph-pattern queries (multi-hop self-joins, sign-split routing,
UNION ALL recombination, outer joins), SPARQL BGP translation, and pluggable
physical layouts — re-expressed Spark-first (DataFrame/SQL/Catalyst), plus
the large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) the reference never had.

No code is copied from the reference; docstring cites (file:line into
/root/reference) mark *behavioral* parity points only.
"""

from rdfproject_msc_spark.session import get_spark
from rdfproject_msc_spark.dictionary import Dictionary
from rdfproject_msc_spark.engine import Engine
from rdfproject_msc_spark.store import TripleStore

__all__ = ["get_spark", "Dictionary", "Engine", "TripleStore"]
__version__ = "0.2.0"
