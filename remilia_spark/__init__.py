"""remilia_spark — a from-scratch PySpark-native rebuild of the crawl
capabilities of ShroXd/remilia (reference at /root/reference, read-only).

The reference is a ~1.5k-LoC Go fetch-parse pipeline (channels + goroutines,
``remilia.go:166-185``).  This package re-expresses those capabilities as a
batch-iterative URL frontier + fetch scheduler over Parquet/Iceberg tables of
Common-Crawl-style pages:

* ``urlnorm``  — RFC 3986 canonicalization + the reference's URL accept regex
  (``utils.go:13-20``).
* ``extract``  — pinned HTML link/text extractor (stdlib ``html.parser``)
  run as ``mapInPandas`` over the ``html:binary`` column
  (reference: goquery parse, ``client.go:152-158``).
* ``corpus``   — deterministic synthetic Common-Crawl-style corpus generator
  (plays "the web"; the corpus join replaces ``client.execute``,
  ``client.go:103-184``).
* ``frontier`` — the superstep: wave selection (eligibility → robots → dedup
  anti-join → per-host budget window rank → priority pop), corpus join,
  extraction, canonicalize/hash/filter, retry-state transitions.
* ``budget``   — token-bucket politeness re-expressed as a per-host budget
  table (``ratelimit.go:69-105`` semantics, made deterministic).
* ``backoff``  — full-jitter exponential backoff re-expressed as frontier
  state columns with hash-seeded deterministic jitter
  (``backoff.go:135-151`` semantics).
* ``storage``  — atomic per-superstep checkpoint commits (Parquet snapshot +
  manifest protocol in the sandbox; Iceberg on real clusters).
* ``oracle``   — single-threaded pure-Python reference crawler that defines
  the canonical crawl ordering / seen set / extracted text.
* ``engine``   — driver loop + config.
* ``datapipe`` — large-scale training-data pipeline operators (dedup,
  similarity search, text analysis, fixed-point link-graph PageRank) over
  document/embedding tables.
* ``sources``  — ingest connectors landing on the pages schema (WARC —
  Common Crawl's native segment format).
* ``streaming``— Structured Streaming ingest of out-of-band URL discovery
  (sitemap pings, feeds) into the frontier's seed landing zone.
"""

__version__ = "0.1.0"
