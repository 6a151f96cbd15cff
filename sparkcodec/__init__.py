"""sparkcodec — PySpark-native per-column lightweight-compression engine.

From-scratch reimplementation of the column-chunk encoding capabilities of
hyparam/hyparquet-writer (see SURVEY.md), Spark-first: numpy codec kernels
inside vectorized pandas/Arrow UDFs, a sampling codec auto-selector, chunk
framing with footer-style stats, skew-aware partitioning, and lineage
manifests.
"""

__version__ = "0.1.0"
