"""Large-scale training-data pipeline operators.

Beyond the reference's crawl loop, a 100 TB web-text pipeline needs
corpus-hygiene operators; these are first-class here, each expressed
Spark-first (built-in functions → whole-stage codegen; pandas/Arrow UDFs
only where built-ins genuinely can't express the op):

* ``textstats``   — token counts, quality scoring, language-ID heuristic,
  document fingerprinting (all pure column math, DuckDB-oracle-checkable).
* ``dedup``       — exact (hash groupBy), MinHash+LSH (explode/min groupBy —
  fully JVM-side), n-gram Jaccard verification, SimHash.
* ``similarity``  — brute-force cosine top-k (higher-order array functions)
  and an LSH-bucketed ANN variant (vectorized numpy signatures).
* ``multimodal``  — binary-column (image/audio) plumbing: schema, batching
  and Arrow UDF signatures are real; codec calls are stubbed because the
  sandbox ships no media libraries.
"""
