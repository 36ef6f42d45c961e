"""Property-based tests: the vectorized LWW kernel must agree with a naive
reference replay on arbitrary event streams (hypothesis-generated), and
must be associative under arbitrary splits — the two properties the whole
engine rests on (SURVEY.md §5, no-Ray kernel tier)."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from grate_ray.stages.merge import finalize, lww_reduce, merge_into_state

events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["I", "U", "D"]),      # op
        st.integers(0, 3),                      # conv (small keyspace → collisions)
        st.integers(0, 3),                      # turn
        st.integers(0, 5),                      # ts (small range → ties)
    ),
    min_size=0,
    max_size=60,
)


def mk_table(events):
    n = len(events)
    return pa.table(
        {
            "op": pa.array([e[0] for e in events], pa.string()),
            "lsn": pa.array(list(range(n)), pa.int64()),
            "conv_id": pa.array([f"c{e[1]}" for e in events], pa.string()),
            "turn_idx": pa.array([e[2] for e in events], pa.int32()),
            "role": pa.array(["u"] * n, pa.string()),
            "text": pa.array([f"v{i}" for i in range(n)], pa.string()),
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.array([e[3] * 1_000_000 for e in events], pa.int64()).cast(
                pa.timestamp("us")
            ),
        }
    )


def naive_final(events):
    best = {}
    for lsn, (op, conv, turn, ts) in enumerate(events):
        key = (f"c{conv}", turn)
        order = (ts, lsn)
        if key not in best or order > best[key][0]:
            best[key] = (order, op, f"v{lsn}")
    return {
        k: text for k, (_, op, text) in best.items() if op != "D"
    }


@settings(max_examples=200, deadline=None)
@given(events_strategy)
def test_lww_matches_naive(events):
    t = mk_table(events)
    out = finalize(lww_reduce(t))
    got = {
        (c, ti): tx
        for c, ti, tx in zip(
            out["conv_id"].to_pylist(),
            out["turn_idx"].to_pylist(),
            out["text"].to_pylist(),
        )
    }
    assert got == naive_final(events)


@settings(max_examples=100, deadline=None)
@given(events_strategy, st.integers(0, 60))
def test_lww_associative_under_split(events, cut):
    t = mk_table(events)
    cut = min(cut, len(events))
    whole = finalize(lww_reduce(t))
    a, b = t.slice(0, cut), t.slice(cut)
    state = lww_reduce(a)
    state = merge_into_state(state, lww_reduce(b)) if b.num_rows else state
    split = finalize(state)
    assert whole.to_pydict() == split.to_pydict()


# --- zone-map soundness (no-Ray tier) ----------------------------------------

zone_events = st.lists(
    st.tuples(
        st.sampled_from(["I", "U", "D"]),
        st.integers(0, 3),   # conv
        st.integers(0, 9),   # turn (the filtered column)
        st.integers(0, 5),   # ts
    ),
    min_size=1,
    max_size=40,
)

predicate = st.tuples(
    st.sampled_from(["==", "!=", "<", "<=", ">", ">="]),
    st.integers(-1, 11),
)


@settings(max_examples=200, deadline=None)
@given(zone_events, predicate)
def test_zone_pruning_never_hides_matches(events, pred):
    """If the zone built from a chain's file stats says a predicate can't
    match, the reconstructed live state must contain NO matching row —
    for arbitrary event streams split into arbitrary chain files."""
    from grate_ray.state.manifest import _column_stats, zone_may_match

    op, val = pred
    t = mk_table(events)
    # arbitrary two-file chain split (like snapshot + delta)
    cut = len(events) // 2
    files = [t.slice(0, cut), t.slice(cut)]
    files = [f for f in files if f.num_rows]
    zone = {}
    for f in files:
        s = _column_stats(f)
        cs = s.get("turn_idx", {})
        if cs.get("all_null") or cs.get("unknown"):
            continue
        if "turn_idx" not in zone:
            zone["turn_idx"] = {"min": cs["min"], "max": cs["max"]}
        else:
            zone["turn_idx"]["min"] = min(zone["turn_idx"]["min"], cs["min"])
            zone["turn_idx"]["max"] = max(zone["turn_idx"]["max"], cs["max"])
    live = finalize(lww_reduce(t))
    import operator as opmod

    fns = {
        "==": opmod.eq, "!=": opmod.ne, "<": opmod.lt,
        "<=": opmod.le, ">": opmod.gt, ">=": opmod.ge,
    }
    matches = [
        v for v in live["turn_idx"].to_pylist()
        if v is not None and fns[op](v, val)
    ]
    if not zone_may_match(zone, "turn_idx", op, val):
        assert matches == [], (zone, op, val, matches)
