"""SPARQL BGP front-end: parse → encode → DataFrame plan."""

from rdfproject_msc_spark.sparql.parser import BGPQuery, TriplePattern, parse_sparql
from rdfproject_msc_spark.sparql.planner import plan_bgp, sparql_to_df

__all__ = ["BGPQuery", "TriplePattern", "parse_sparql", "plan_bgp", "sparql_to_df"]
