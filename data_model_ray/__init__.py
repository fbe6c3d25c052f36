"""data_model_ray — a Ray-Data-native spatial-join + tile-pyramid engine.

Built from scratch (NOT a port) with the query/data-processing semantics of
the reference ``eopf-geozarr`` engine (EOPF-Explorer/data-model), re-derived
as ``ray.data.Dataset`` pipelines over Arrow batches:

- deterministic hierarchical grids (``grid``: quadtree geocell + S2 cell ids)
- html geotag extraction (``stages.extract``) — byte-identical-text invariant
- stateful actor-pool geoindexing + point-in-polygon joins (``stages.geoindex``)
- exact / near dedup (``stages.dedup``), text analysis (``stages.text``)
- per-cell aggregates and /2 tile-pyramid rollups (``pipelines.pyramid``)
- per-cell kNN and ANN similarity search (``stages.knn``)
- resumable partitioned sinks with per-partition lineage (``state.lineage``)

No module in this package calls ``ray.init``/``ray.shutdown``; session
ownership belongs to the caller (driver, bench.py, or the test fixture).
"""

__version__ = "0.1.0"
