"""ohsome_planet_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of the query/data-processing capabilities of
onnimonni/ohsome-planet (reference at /root/reference, Java) as an idiomatic
PySpark engine: DataFrame/Catalyst for all relational structure, vectorized
NumPy/Arrow kernels (pandas UDFs) for the geometry/tiling math, broadcast
STRtree-style point-in-polygon joins, H3/S2/XZ2 cell indexes, temporal
history-merge semantics, and a snapshot-manifest table layer for
checkpoint/resume with per-partition lineage.

Nothing in here is ported code: every kernel is implemented from the public
algorithm (Böhm XZ-ordering, Chamberlain–Duquette spherical excess, S2
quadtree/Hilbert, ray casting) with the reference cited only for *semantics*
(file:line in docstrings).
"""

__version__ = "0.1.0"
