"""Input connectors that materialize the ``pages`` table from external
formats.  Every source lands on the one fixed schema the engine joins
against (BASELINE.json ``input_hint``):

    url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING

so a crawl can run unchanged over a synthetic corpus (``corpus.py``), a
parquet snapshot, or raw Common-Crawl WARC segments (``sources.warc``).
"""

from .robotstxt import parse_robots_txt, robots_table  # noqa: F401
from .sitemap import parse_sitemap, sitemap_urls  # noqa: F401
from .warc import read_warc, warc_bytes  # noqa: F401
