"""netascore_spark — a PySpark-native spatial-join + tiling + segment-scoring engine.

Re-realizes the query and data-processing capabilities of
plus-mobilitylab/netascore (reference: /root/reference, a PostGIS/Jinja2 SQL
pipeline) as idiomatic Spark DataFrame plans:

- ``netascore_spark.functions``  — pure Column expressions: OSM tag
  normalization vocabularies, access cascades (osm_calculate_access_*.sql),
  attribute CASE tables (osm_attributes.sql.j2).
- ``netascore_spark.plans``      — the YAML mode-profile -> Column-expression
  compiler (core/index_step.py + sql/functions/calculate_index.sql.j2).
- ``netascore_spark.geometry``   — vectorized planar geometry kernel over WKB
  (numpy; replaces PostGIS ST_* functions).
- ``netascore_spark.grid``       — planar cell-grid spatial index (H3-like
  API; replaces GiST indexes with cell equi-joins).
- ``netascore_spark.operators``  — distributed operators: cell-grid spatial
  joins, deterministic id assignment, dedup (exact/minhash/simhash),
  similarity search, text analytics, multimodal plumbing.
- ``netascore_spark.pipeline``   — the six-stage pipeline (network build,
  attributes, index, export) + the web-scale pages graft + checkpointing.
"""

__version__ = "0.1.0"
