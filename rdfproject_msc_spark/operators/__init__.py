"""Large-scale training-data-pipeline operators (north-star extensions).

Beyond reference parity: deduplication, similarity search, text analysis,
multimodal-column plumbing — each designed for the 100 TB path (joins not
driver maps, built-in functions not row UDFs, Arrow-batched Pandas UDFs where
Python is unavoidable).
"""
