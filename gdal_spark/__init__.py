"""gdal_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the reference GDAL fork (see /root/repo/SURVEY.md),
re-expressed Spark-first: DataFrame/Catalyst plans, cell-id equi-join
spatial filters, broadcast polygon indexes, vectorized numpy kernels
inside Arrow-batched pandas UDFs. No per-row Python on hot paths.

Layout:
  cells      — hierarchical quadtree cell ids (H3/S2 analog; GDAL quadkey
               math, gdal2tiles.py:517 / port/cpl_quad_tree.cpp patterns)
  geometry   — numpy PIP (ray-cast + winding), bbox, distances
               (semantics of ogr/ogrlinearring.cpp:462-532)
  wkb        — minimal WKB encode/decode (Point/LineString/Polygon/Multi*)
  strtree    — broadcastable STR-packed bbox tree (GPKG RTree analog)
  operators  — spatial join, kNN, dedup, similarity, text analysis,
               OGR-SQL compat veneer
  raster     — mercator tiling math, warp/resample, rasterize, polygonize
  lineage    — per-partition checkpoint manifests + resume
  metrics    — per-stage shuffle/skew metrics
"""

__version__ = "0.1.0"
