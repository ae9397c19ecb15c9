"""Property-based cuckoo-filter invariants (hypothesis, pure numpy — no
Spark).  The one invariant the engine's correctness rests on: a key whose
insert was reported successful can NEVER test negative, under any mix of
inserts and deletes of OTHER keys, at any load the table accepted."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from remilia_spark import cuckoo

_keyarrays = st.lists(
    st.integers(min_value=-2**63, max_value=2**63 - 1),
    min_size=0, max_size=400, unique=True,
).map(lambda xs: np.array(xs, dtype=np.int64))


@settings(max_examples=60, deadline=None)
@given(keys=_keyarrays, slots_log2=st.integers(min_value=4, max_value=10))
def test_no_false_negatives_when_insert_succeeds(keys, slots_log2):
    tbl = cuckoo.new_table(1 << slots_log2)
    failed = cuckoo.insert(tbl, keys)
    if failed == 0:
        assert cuckoo.contains(tbl, keys).all()
    # whether or not inserts failed, stored fingerprints never exceed keys
    assert (tbl != 0).sum() <= len(keys)


@settings(max_examples=40, deadline=None)
@given(keys=_keyarrays)
def test_delete_of_other_keys_never_evicts_survivors(keys):
    """Delete half the keys: every surviving key still tests positive
    (the slot-per-duplicate insert discipline is what guarantees this)."""
    tbl = cuckoo.new_table(1 << 10)  # 4096 slots, load <= ~10%
    assert cuckoo.insert(tbl, keys) == 0
    half = len(keys) // 2
    gone, kept = keys[:half], keys[half:]
    removed = cuckoo.delete(tbl, gone)
    assert removed == half
    if len(kept):
        assert cuckoo.contains(tbl, kept).all()


@settings(max_examples=40, deadline=None)
@given(keys=_keyarrays, extra=_keyarrays)
def test_insert_is_idempotent_for_membership(keys, extra):
    """Inserting more keys never flips an earlier key to negative."""
    tbl = cuckoo.new_table(1 << 10)
    if cuckoo.insert(tbl, keys) != 0:
        return
    if cuckoo.insert(tbl, extra) != 0:
        return  # saturation: the Spark layer flips to pass-through
    assert cuckoo.contains(tbl, keys).all()
