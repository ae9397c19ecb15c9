"""Full-jitter exponential backoff as deterministic frontier-state columns.

The reference sleeps a jittered delay between retries
(``backoff.go:135-151``): ``delay = rand(0, min(maxDelay,
minDelay*attempt^multiplier) - minDelay) + minDelay`` (note
``attempt^multiplier``, not ``multiplier^attempt`` — ``backoff.go:142``),
with the retry driver bumping an attempt counter until ``maxAttempt``
(``backoff.go:171-199``).

Our engine replaces the sleep with a frontier-state transition: a failed row
gets ``attempt += 1`` and ``next_eligible = superstep + steps(url, attempt)``.
The jitter uniform is **hash-seeded** — derived from
``sha256(url || '|' || attempt)`` — never from RNG state, so retries are
deterministic and resume/parallelism-stable (SURVEY §7).  The same formula is
computed column-side in Spark (``F.sha2``/``F.conv`` — JVM, codegen) and in
pure Python by the oracle; tests pin their equality.

Pinned formula (1 superstep == 1 reference second):

    u       = int(sha256(f"{url}|{attempt}").hexdigest()[:13], 16) / 16**13
    cap     = min(max_delay, min_delay * attempt**multiplier)
    delay   = min_delay + u * (cap - min_delay)          # attempt >= 1
    steps   = max(1, ceil(delay))

At attempt 1: cap == min_delay so delay == min_delay exactly — mirroring the
reference contract "Next() at attempt 1 returns exactly minDelay"
(``backoff_test.go:53-59``).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column
from pyspark.sql import functions as F

_HEX_DIGITS = 13  # 52 bits — exact in an IEEE double on both runtimes
_DENOM = float(16 ** _HEX_DIGITS)


def jitter_u(url: str, attempt: int) -> float:
    """Deterministic uniform in [0, 1) — pure-Python (oracle) side."""
    h = hashlib.sha256(f"{url}|{attempt}".encode("utf-8")).hexdigest()
    return int(h[:_HEX_DIGITS], 16) / _DENOM


def backoff_steps(url: str, attempt: int, *, min_delay: float,
                  max_delay: float, multiplier: float) -> int:
    """Supersteps to wait after failure number ``attempt`` (>= 1)."""
    cap = min(max_delay, min_delay * (attempt ** multiplier))
    delay = min_delay + jitter_u(url, attempt) * (cap - min_delay)
    return max(1, math.ceil(delay))


def jitter_u_col(url: Column, attempt: Column) -> Column:
    """Same uniform, computed JVM-side (sha2 + conv; no Python)."""
    h = F.sha2(F.concat_ws("|", url, attempt.cast("string")), 256)
    return F.conv(F.substring(h, 1, _HEX_DIGITS), 16, 10).cast("double") / F.lit(_DENOM)


def backoff_steps_col(url: Column, attempt: Column, *, min_delay: float,
                      max_delay: float, multiplier: float) -> Column:
    cap = F.least(F.lit(float(max_delay)),
                  F.lit(float(min_delay)) * F.pow(attempt.cast("double"),
                                                  F.lit(float(multiplier))))
    delay = F.lit(float(min_delay)) + jitter_u_col(url, attempt) * (cap - F.lit(float(min_delay)))
    return F.greatest(F.lit(1), F.ceil(delay)).cast("int")
