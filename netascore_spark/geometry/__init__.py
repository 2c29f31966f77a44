"""Planar geometry kernel (numpy, no external GIS deps).

Replaces the PostGIS ``ST_*`` surface the reference leans on
(SURVEY.md §2.8).  Geometries travel between Spark tasks as WKB ``binary``
columns; inside Arrow-batched pandas UDFs they are decoded to plain numpy
coordinate arrays and processed with the exact planar algorithms in
:mod:`netascore_spark.geometry.ops`.

Shapely/GEOS is intentionally not a dependency: the container lacks it, and
the operator set the reference needs (intersects / intersection points /
split / dwithin / buffer / polygon area / clipping) is small enough to
implement exactly.
"""

from netascore_spark.geometry import ops, wkb  # noqa: F401
