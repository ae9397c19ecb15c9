"""Property-based invariants for query-param canonicalization
(hypothesis, pure Python — no Spark): idempotence, strip-set soundness,
and permutation-invariance of the sorted (dedup-key) form."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from remilia_spark.urlnorm import TRACKING_PARAMS, clean_params

# param names: plain, tracking, and utm_-prefixed; values URL-ish ASCII
_names = st.one_of(
    st.text(alphabet="abcdeskxyz_", min_size=1, max_size=6),
    st.sampled_from(TRACKING_PARAMS),
    st.text(alphabet="abc", min_size=0, max_size=3).map(lambda s: "utm_" + s),
)
_vals = st.text(alphabet="abc123%=./", min_size=0, max_size=6)
_parts = st.lists(
    st.one_of(_names,                                   # name-only flag
              st.tuples(_names, _vals).map(lambda t: f"{t[0]}={t[1]}"),
              st.just("")),                             # empty part
    min_size=0, max_size=8)


def _url(parts):
    return "http://h.test/p" + ("?" + "&".join(parts) if parts else "")


@settings(max_examples=200, deadline=None)
@given(parts=_parts, srt=st.booleans())
def test_idempotent(parts, srt):
    u = _url(parts)
    once = clean_params(u, sort_params=srt)
    assert clean_params(once, sort_params=srt) == once


@settings(max_examples=200, deadline=None)
@given(parts=_parts)
def test_no_tracking_survives_and_no_kept_part_lost(parts):
    u = _url(parts)
    out = clean_params(u)
    q = out.split("?", 1)[1] if "?" in out else ""
    kept = [p for p in q.split("&")] if q else []
    for p in kept:
        name = p.split("=", 1)[0].lower()
        assert not name.startswith("utm_") and name not in TRACKING_PARAMS
    # every non-tracking, non-empty input part survives, in order
    want = [p for p in parts
            if p != "" and not (
                p.split("=", 1)[0].lower().startswith("utm_")
                or p.split("=", 1)[0].lower() in TRACKING_PARAMS)]
    assert kept == want


@settings(max_examples=200, deadline=None)
@given(parts=_parts, seed=st.randoms(use_true_random=False))
def test_sorted_form_is_permutation_invariant(parts, seed):
    shuffled = list(parts)
    seed.shuffle(shuffled)
    assert clean_params(_url(parts), sort_params=True) \
        == clean_params(_url(shuffled), sort_params=True)
