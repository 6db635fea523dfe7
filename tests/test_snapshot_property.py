"""Property-based golden test: random change-set scripts driven through the
snapshot plan must match the Python FileDiff oracle on every tick —
generalizing the scripted EndToEnd scenarios to arbitrary op sequences
(appends, rewrites, shrinks, empty payloads, binary bytes)."""

from __future__ import annotations

from tests.conftest import prop_examples
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_snapshot import expected_records, run_change_sets

PATHS = ["/tails/t0", "/tails/t1", "/updates/u0", "/updates/u1"]

payload = st.binary(min_size=0, max_size=64)
op = st.tuples(st.sampled_from(["append", "update"]), st.sampled_from(PATHS), payload).map(
    # tail dirs take appends AND rewrites (rewrites model external edits:
    # shrink / prefix mutation); update dirs only ever get rewritten
    lambda t: ("update" if t[1].startswith("/updates/") else t[0], t[1], t[2])
)
tick = st.lists(op, min_size=1, max_size=4)
script = st.lists(tick, min_size=1, max_size=4)


@settings(max_examples=prop_examples(12), deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(script=script)
def test_random_change_sets_match_oracle(spark, script):
    for i, (got, exp) in enumerate(run_change_sets(spark, script)):
        assert got == sorted(exp), f"tick {i} of {script!r}"
