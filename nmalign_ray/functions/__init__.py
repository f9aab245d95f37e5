"""Large-scale training-data operators over the test tables.

Beyond the reference's own operator inventory (SURVEY §2), these are the
operations a 100 TB training-data pipeline needs, each expressed
Ray-Data-first (vectorized ``map_batches`` over Arrow batches, partial
aggregation before shuffles, broadcast small sides):

* ``textstats``  — normalization, token counting, quality scoring,
  language-ID, document fingerprinting (documents table)
* ``dedup``      — exact (hash groupby), MinHash+LSH, SimHash,
  n-gram Jaccard verification (documents table)
* ``simsearch``  — brute-force cosine top-k + LSH-bucketed ANN
  (embeddings table)
* ``relational`` — grouped aggregation with pre-combine, broadcast and
  anti joins, top-k, windowed event aggregates (TPC-H-ish tables)
* ``media``      — multimodal decode/feature plumbing (binary columns,
  actor-pool stages; decode itself stubbed — no image/audio libs here)

Modules that have an exact DuckDB-SQL twin export ``*_SQL`` constants
consumed by ``__ray_entry__.oracle_sql``.
"""
