"""Deterministic synthetic Common-Crawl-style corpus (plays "the web").

The reference fetches live pages over fasthttp (``client.go:103-184``); our
engine replaces the network with an equi-join against a ``pages`` table.
This module generates that table — schema per BASELINE.json ``input_hint``:

    pages: url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING

plus ``seeds (url, seed_order)`` and ``robots (host, disallow, crawl_delay)``
per FIXTURES.md.  Everything is seeded (default 42) and pure Python — equal
parameters always produce byte-identical tables.

Shape knobs exercised by the engine/tests:
* one **mega-host** owning >=30% of pages (skew splitting),
* ~20% of mega-host pages under ``/private/`` (robots disallow),
* link mix: same-host relative (3 syntactic forms), cross-host absolute,
  shouty absolute (``HTTP://HOST0.TEST:80/...`` — canonicalization),
  duplicates, fragment-only, ``javascript:``/``mailto:`` (invalid), and
  links to URLs absent from the table (fetch failure -> retry path,
  ``backoff.go:171-199`` semantics).
"""

from __future__ import annotations

import datetime as dt
import random
from dataclasses import dataclass, field
from pathlib import Path

import pandas as pd

from .extract import extract_text

_EPOCH = dt.datetime(2024, 8, 7, 0, 0, 0)

# bump when generation changes — cache dirs (bench) key on this
CORPUS_VERSION = 3

_WORDS = (
    "crawl frontier spark shuffle parquet arrow vector batch superstep "
    "politeness budget bloom dedup canonical host depth wave fetch parse "
    "link graph page corpus robots token bucket jitter backoff retry"
).split()


@dataclass
class Corpus:
    pages: pd.DataFrame
    seeds: pd.DataFrame
    robots: pd.DataFrame
    host_sizes: dict[str, int] = field(default_factory=dict)

    def write(self, out_dir: str | Path) -> Path:
        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        pages = self.pages.copy()
        # Spark's parquet reader rejects TIMESTAMP(NANOS); write micros.
        pages["warc_ts"] = pages["warc_ts"].astype("datetime64[us]")
        # Small row groups: parquet is only splittable at row-group
        # boundaries, and pandas' default (1M rows) produces ONE group —
        # an unsplittable file whose scan (and every stage that inherits
        # its partitioning, like the broadcast-join -> mapInPandas parse)
        # runs on a single core at any cluster size.  Real crawl corpora
        # arrive as many WARC/parquet files; 8k-row groups model that.
        pages.to_parquet(out / "pages.parquet", index=False,
                         row_group_size=8192)
        self.seeds.to_parquet(out / "seeds.parquet", index=False)
        self.robots.to_parquet(out / "robots.parquet", index=False)
        return out


def _host_sizes(n_pages: int, n_hosts: int) -> list[int]:
    """host0 is the mega-host (35%); the rest Zipf-ish 1/k."""
    mega = max(1, int(n_pages * 0.35))
    rest = n_pages - mega
    weights = [1.0 / k for k in range(1, n_hosts)]
    tot = sum(weights) or 1.0
    sizes = [max(1, int(rest * w / tot)) for w in weights]
    # fix rounding drift onto the second host
    drift = rest - sum(sizes)
    if sizes:
        sizes[0] = max(1, sizes[0] + drift)
    return [mega] + sizes


def page_url(host_idx: int, page_idx: int, host_size: int) -> str:
    host = f"host{host_idx}.test"
    # 20% of the mega-host's pages live under /private/ (robots-disallowed)
    if host_idx == 0 and host_size > 0 and page_idx % 5 == 4:
        return f"http://{host}/private/page/{page_idx}"
    return f"http://{host}/page/{page_idx}"


def generate_corpus(
    n_pages: int = 60,
    n_hosts: int = 5,
    seed: int = 42,
    n_seeds: int | None = None,
    max_links: int = 12,
) -> Corpus:
    rng = random.Random(seed)
    sizes = _host_sizes(n_pages, n_hosts)
    hosts = [f"host{h}.test" for h in range(n_hosts)]
    urls: list[tuple[int, int, str]] = []  # (host_idx, page_idx, url)
    for h, size in enumerate(sizes):
        for i in range(size):
            urls.append((h, i, page_url(h, i, size)))

    rows = []
    for seq, (h, i, url) in enumerate(urls):
        n_links = rng.randint(0, max_links)
        hrefs: list[str] = []
        for _ in range(n_links):
            kind = rng.choices(
                ["rel", "abs", "shout", "dup", "frag", "invalid", "missing",
                 "weird"],
                weights=[40, 20, 5, 10, 5, 5, 15, 3],
            )[0]
            if kind == "dup" and hrefs:
                hrefs.append(rng.choice(hrefs))
                continue
            if kind == "weird":
                # RFC-3986-illegal but regex-accepted chars (utils.go:13-20
                # admits any non-whitespace) — java.net.URI rejects these;
                # the engine must canonicalize them without parse_url
                hrefs.append(f"/weird/a|b<{rng.randint(0, 9)}>")
                continue
            if kind == "frag":
                hrefs.append("#section-" + str(rng.randint(0, 9)))
                continue
            if kind == "invalid":
                hrefs.append(rng.choice(
                    ["javascript:void(0)", "mailto:a@b.test", "tel:+1555", ""]))
                continue
            if kind == "missing":
                th = rng.randrange(len(sizes))
                hrefs.append(
                    f"http://host{th}.test/page/{sizes[th] + rng.randint(0, 99)}")
                continue
            if kind in ("abs", "shout"):
                th = rng.randrange(len(sizes))
                tp = rng.randrange(sizes[th])
                target = page_url(th, tp, sizes[th])
                if kind == "shout":
                    target = target.replace(
                        f"http://host{th}.test/",
                        f"HTTP://HOST{th}.TEST:80/", 1)
                hrefs.append(target)
                continue
            # rel: same-host target in one of three syntactic forms
            tp = rng.randrange(sizes[h])
            target = page_url(h, tp, sizes[h])
            path = target.split(".test", 1)[1]  # e.g. /page/3 or /private/page/4
            base_dir = url.split(".test", 1)[1].rsplit("/", 1)[0] + "/"
            form = rng.randrange(3)
            if form == 1 and base_dir == "/page/" and path.startswith("/page/"):
                hrefs.append(".." + path)  # /page/X -> ../page/Y -> /page/Y
            elif form == 2 and path.startswith(base_dir):
                hrefs.append(path[len(base_dir):])  # bare segment, same dir
            else:
                hrefs.append(path)
        paras = [
            " ".join(rng.choices(_WORDS, k=rng.randint(4, 14)))
            for _ in range(rng.randint(1, 5))
        ]
        body = [f"<h1>Heading {h}-{i}</h1>"]
        for k, p in enumerate(paras):
            body.append(f"<p>{p}</p>")
            if k < len(hrefs):
                body.append(f'<a href="{hrefs[k]}">anchor {k}</a>')
        for k in range(len(paras), len(hrefs)):
            body.append(f'<a href="{hrefs[k]}">anchor {k}</a>')
        html = (
            f"<html><head><title>Host {h} Page {i}</title></head>"
            f"<body>{''.join(body)}</body></html>"
        ).encode("utf-8")
        rows.append({
            "url": url,
            "warc_ts": _EPOCH + dt.timedelta(seconds=seq),
            "html": html,
            "text": extract_text(html),
            "lang": "xx" if seq == len(urls) - 1 else "en",
        })
    pages = pd.DataFrame(rows)

    if n_seeds is None:
        n_seeds = 1 if n_pages < 100 else 10
    seed_urls, used = [], set()
    h = 0
    while len(seed_urls) < min(n_seeds, n_pages):
        hh = h % n_hosts
        idx = len(seed_urls) // n_hosts
        if idx < sizes[hh]:
            u = page_url(hh, idx, sizes[hh])
            if u not in used:
                used.add(u)
                seed_urls.append(u)
        h += 1
        if h > n_seeds * n_hosts + n_hosts:
            break
    seeds = pd.DataFrame({
        "url": seed_urls,
        "seed_order": list(range(len(seed_urls))),
    })

    robots = pd.DataFrame({
        "host": hosts,
        "disallow": [["/private/"] if h == 0 else [] for h in range(n_hosts)],
        # host2 asks for a 2-superstep crawl delay; everyone else none
        "crawl_delay": [2 if h == 2 else 0 for h in range(n_hosts)],
    })
    return Corpus(pages=pages, seeds=seeds, robots=robots,
                  host_sizes=dict(zip(hosts, sizes)))
