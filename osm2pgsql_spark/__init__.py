"""osm2pgsql_spark — a PySpark-native analytics/ETL engine with the
capabilities of osm2pgsql (reference: osm2pgsql-dev/osm2pgsql).

The reference is a streaming C++ ETL engine that turns OpenStreetMap
node/way/relation streams into PostGIS tables via a user-programmable
(Lua) transform, with incremental diff updates, tile-expiry change
logs and map-generalization analytics.

This package re-expresses that surface Spark-first:

- the three entity streams become DataFrames (``model``),
- the "middle" random-access store becomes joins on bucketed id columns
  (``operators.assembly``, ``operators.reverse_deps``),
- the Lua callback surface becomes a Python config DSL compiled to
  Catalyst column expressions where possible (``plans.flex``),
- geometry work is a pure-numpy WKB kernel library executed in
  Arrow-batched pandas UDFs (``functions.geometry``),
- tile/expiry math is plain JVM-side Column expressions
  (``functions.tiles``),
- diff/append becomes a batch-incremental MERGE job (``streaming``),
- plus the large-scale training-data operators (dedup, similarity
  search, text analysis, multimodal plumbing) the reference lacks.
"""

__version__ = "0.1.0"

from osm2pgsql_spark.session import get_spark  # noqa: F401
