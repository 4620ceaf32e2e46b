"""SpaceSaving heavy hitters: exact regime (gate capacity) and the
genuinely-approximate regime's guarantees (Metwally et al. 2005)."""

import random

from mircv_project_spark.streaming.heavy_hitters import spacesaving_merge


def _run(stream_batches, cap):
    counts, errs = {}, {}
    for b in stream_batches:
        spacesaving_merge(counts, errs, b, cap)
    return counts, errs


def test_exact_when_capacity_covers_vocab():
    rng = random.Random(7)
    items = [f"t{rng.randrange(30)}" for _ in range(5000)]
    true = {}
    for t in items:
        true[t] = true.get(t, 0) + 1
    batches = [
        {t: items[i : i + 500].count(t) for t in set(items[i : i + 500])}
        for i in range(0, len(items), 500)
    ]
    counts, errs = _run(batches, cap=64)
    assert counts == true
    assert all(e == 0 for e in errs.values())


def test_approximate_regime_bounds():
    """cap << vocab: every stored count overestimates the true count by
    at most its err, total count is conserved, and any term with true
    frequency > N/cap is guaranteed present."""
    rng = random.Random(11)
    # skewed stream: a few heavy terms + a long tail
    items = ["heavy1"] * 800 + ["heavy2"] * 600 + [
        f"tail{rng.randrange(500)}" for _ in range(1000)
    ]
    rng.shuffle(items)
    true = {}
    for t in items:
        true[t] = true.get(t, 0) + 1
    batches = [
        {t: items[i : i + 200].count(t) for t in set(items[i : i + 200])}
        for i in range(0, len(items), 200)
    ]
    cap = 32
    counts, errs = _run(batches, cap)
    n = len(items)
    assert len(counts) <= cap
    assert sum(counts.values()) >= n  # SpaceSaving never undercounts totals
    for t, c in counts.items():
        assert c >= true.get(t, 0)  # overestimate only
        assert c - errs[t] <= true.get(t, 0)  # err bounds the inflation
    for t, f in true.items():
        if f > n / cap:
            assert t in counts, t  # guaranteed heavy-term retention
