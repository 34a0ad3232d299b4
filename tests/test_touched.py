"""Derived round-touched pinning (plans/touched.py, r9 verdict item 4):
the set of queries pinned to the front of the driver rotation is computed
from git + the package's AST import graph, not hand-maintained."""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path

from clickhouse_segments_tutorial_spark.plans import registry, touched

REPO = Path(__file__).resolve().parents[1]
PKG = touched.PKG


def test_import_graph_edges_exist():
    graph = touched._import_graph(str(REPO / PKG))
    cur = f"{PKG}/plans/curation.py"
    assert cur in graph
    # curation imports sampling (top-level) and stream_quota (function-local)
    assert f"{PKG}/operators/sampling.py" in graph[cur]
    assert f"{PKG}/streaming/stream_quota.py" in graph[cur]
    # relative single-dot import resolves too
    assert f"{PKG}/plans/registry.py" in graph[cur]


def test_operator_edit_reaches_its_query_modules():
    """Editing an operator must pin the plans modules that use it — the
    reverse-reachability the r9 hand list encoded manually."""
    graph = touched._import_graph(str(REPO / PKG))
    changed = {f"{PKG}/operators/sampling.py"}
    closure = set(changed)
    grew = True
    while grew:
        grew = False
        for mod, deps in graph.items():
            if mod not in closure and deps & closure:
                closure.add(mod)
                grew = True
    assert f"{PKG}/plans/curation.py" in closure
    assert f"{PKG}/plans/llm.py" in closure


def _git(cwd: Path, *args: str) -> None:
    subprocess.run(
        ["git", *args],
        cwd=cwd,
        check=True,
        capture_output=True,
        env={
            "GIT_AUTHOR_NAME": "t",
            "GIT_AUTHOR_EMAIL": "t@t",
            "GIT_COMMITTER_NAME": "t",
            "GIT_COMMITTER_EMAIL": "t@t",
            "HOME": str(cwd),
            "PATH": "/usr/bin:/bin:/usr/local/bin",
        },
    )


def test_tmp_checkout_edit_pins_module(tmp_path):
    """End-to-end over a real git checkout: copy the package, commit it
    with a CORRECTNESS artifact (the round base), edit one plans module,
    and see exactly its import-closure consumers derived as touched."""
    shutil.copytree(REPO / PKG, tmp_path / PKG)
    (tmp_path / "CORRECTNESS_r01.json").write_text("{}")
    _git(tmp_path, "init", "-q")
    _git(tmp_path, "add", "-A")
    _git(tmp_path, "commit", "-qm", "round base")

    touched._import_graph.cache_clear()
    try:
        assert touched.touched_modules(tmp_path) == set()

        target = tmp_path / PKG / "plans" / "curation.py"
        target.write_text(target.read_text() + "\n# edited this round\n")
        mods = touched.touched_modules(tmp_path)
        assert f"{PKG}/plans/curation.py" in mods
        # registry.py is imported BY curation, not the reverse: it must not
        # be dragged in by a leaf edit
        assert f"{PKG}/operators/sampling.py" not in mods

        # an UNCOMMITTED newer correctness file (the driver writes it
        # mid-round before committing) must not disable pinning: the base
        # falls back to the newest COMMITTED artifact
        (tmp_path / "CORRECTNESS_r02.json").write_text("{}")
        assert f"{PKG}/plans/curation.py" in touched.touched_modules(tmp_path)
        (tmp_path / "CORRECTNESS_r02.json").unlink()

        # a NEW untracked module with consumers-to-be counts as touched too
        # (graph is lru-cached per process — a file created after the first
        # build needs a cache clear, which only matters inside tests)
        (tmp_path / PKG / "plans" / "brand_new.py").write_text("x = 1\n")
        touched._import_graph.cache_clear()
        assert f"{PKG}/plans/brand_new.py" in touched.touched_modules(tmp_path)
    finally:
        touched._import_graph.cache_clear()


def test_registry_round_touched_matches_module_mapping(monkeypatch):
    """Registry pins exactly the queries of derived-touched modules plus
    the manual override (override neutralized here — the live set varies
    by round and would otherwise leak into the module-mapping check)."""
    monkeypatch.setattr(registry, "ROUND_TOUCHED_OVERRIDE", frozenset())
    # likewise the live must-sample tier (tested separately in
    # test_must_sample_tier_outranks_deadline_block)
    monkeypatch.setattr(registry, "ROUND_MUST_SAMPLE", frozenset())
    # neutralize the union-deadline block (tested separately in
    # test_union_deadline_block_preempts_pins) — the live CORRECTNESS
    # files would otherwise front whatever names happen to be stale
    monkeypatch.setattr(registry, "_union_deadline", lambda: -10)
    monkeypatch.setattr(
        registry, "_touched_module_paths", lambda: {f"{PKG}/plans/curation.py"}
    )
    names = registry.round_touched_names()
    assert "semantic_dedup_keep" in names
    assert "novelty_ngram_docs" in names
    assert "q1_pricing_summary" not in names
    # pinned queries lead the rotation
    ordered = list(registry.all_queries())
    n = len(names)
    assert set(ordered[:n]) == set(names)

    monkeypatch.setattr(registry, "_touched_module_paths", lambda: set())
    monkeypatch.setattr(
        registry, "ROUND_TOUCHED_OVERRIDE", frozenset({"q1_pricing_summary"})
    )
    assert registry.round_touched_names() == {"q1_pricing_summary"}


def test_override_names_lead_pinned_block_ahead_of_staleness(monkeypatch):
    """r14 verdict item 6: when a round's derived touched set is so
    broad it covers (nearly) the whole registry, the pinned block
    degenerates to plain staleness order and the round's actually-
    behavior-changed queries — green last round, hence freshest — sort
    BEHIND everything and miss the driver window. ROUND_TOUCHED_OVERRIDE
    names must therefore lead the pinned block AHEAD of staleness, so a
    hand-declared behavior change is guaranteed a fresh driver row no
    matter how broad the auto-derivation went."""
    qmods = registry._query_module_paths()
    monkeypatch.setattr(registry, "_union_deadline", lambda: -10)
    monkeypatch.setattr(registry, "ROUND_MUST_SAMPLE", frozenset())
    # simulate the degenerate round: EVERY query module derived-touched
    monkeypatch.setattr(registry, "_touched_module_paths", lambda: qmods)
    # recently-green names (q1 was green in every round) would normally
    # sort dead last; the override must put them first anyway
    monkeypatch.setattr(
        registry,
        "ROUND_TOUCHED_OVERRIDE",
        frozenset({"q1_pricing_summary", "segment_overlap_kmv"}),
    )
    ordered = list(registry.all_queries())
    head2 = set(ordered[:2])
    assert head2 == {"q1_pricing_summary", "segment_overlap_kmv"}


def test_global_infrastructure_change_is_not_pinned(monkeypatch):
    """A changed file whose closure spans EVERY query module
    (registry.py, session.py, ...) must NOT pin everything — the
    all-pinned order degenerates to plain last-green and sorts genuinely
    edited queries behind their peers. Selective changes (even broad
    ones reaching most-but-not-all modules) still pin."""
    from clickhouse_segments_tutorial_spark.plans import touched as tmod

    qmods = registry._query_module_paths()
    monkeypatch.setattr(
        tmod,
        "touched_modules_by_change",
        lambda repo_root=None: {
            f"{PKG}/plans/registry.py": set(qmods) | {f"{PKG}/plans/registry.py"},
            f"{PKG}/plans/curation.py": {
                f"{PKG}/plans/curation.py",
                f"{PKG}/plans/bpe_queries.py",
            },
        },
    )
    monkeypatch.setattr(registry, "_TOUCHED_CACHE", None)
    names = registry.round_touched_names()
    assert "semantic_dedup_keep" in names  # selective closure pinned
    assert "bpe_merges_docs" in names
    assert "q1_pricing_summary" not in names  # global change dropped


def test_pin_cap_and_rotation_invariant_98_registry_26_pins(monkeypatch):
    """r10 verdict item 2: uncapped pinning (~26 pins of a 50 window over
    98 queries) starved the staleness rotation — 22 queries went
    unchecked r08→r10. Simulate the driver at exactly that shape and
    assert the restored invariants: pins capped at window/2, the tail in
    strict staleness order, and a BOUNDED staleness period of
    ceil(N_unpinned / (window - cap)) rounds even with 26 persistent
    pins (vs unbounded-tail starvation before the cap)."""
    monkeypatch.setattr(registry, "_union_deadline", lambda: -10)
    N, W, PINS = 98, 50, 26
    names = [f"q{i:03d}" for i in range(N)]
    pinned_names = set(names[:PINS])
    spec = {
        n: (registry.QuerySpec(name=n, spark=lambda s, d: None), n in pinned_names)
        for n in names
    }
    last: dict[str, int] = {}
    monkeypatch.setattr(registry, "_driver_window", lambda: W)
    monkeypatch.setattr(registry, "_specs_with_touched", lambda: dict(spec))
    monkeypatch.setattr(registry, "_last_green_round", lambda: dict(last))
    cap = registry.pin_cap()
    assert cap == W // 2 == 25

    period = -(-(N - cap) // (W - cap))  # ceil(73/25) = 3 unpinned slots/round
    for rnd in range(1, 10):
        order = list(registry.all_queries())
        assert len(order) == N
        head, tail = order[:cap], order[cap:]
        # pin block: capped, pinned-only (26 pins saturate it), stalest pins kept
        assert all(n in pinned_names for n in head)
        # exactly one pin overflows; it is the MOST recently green pin
        overflow = [n for n in tail if n in pinned_names]
        assert len(overflow) == PINS - cap == 1
        if rnd > 1:
            assert last[overflow[0]] == max(last.get(n, -1) for n in pinned_names)
        # tail is strictly staleness-ordered (never-checked first)
        tail_keys = [last.get(n, -1) for n in tail]
        assert tail_keys == sorted(tail_keys)
        for n in order[:W]:
            last[n] = rnd
        if rnd > period:
            gaps = {n: rnd - last[n] for n in names}
            assert max(gaps.values()) < period, (
                f"round {rnd}: starved queries "
                f"{[n for n, g in gaps.items() if g >= period]}"
            )

    # with NO pins the registry restores the original two-round guarantee
    spec0 = {n: (s, False) for n, (s, _) in spec.items()}
    monkeypatch.setattr(registry, "_specs_with_touched", lambda: dict(spec0))
    last.clear()
    covered: set[str] = set()
    for rnd in (1, 2):
        window = list(registry.all_queries())[:W]
        covered |= set(window)
        for n in window:
            last[n] = rnd
    assert covered == set(names)


def test_rotation_optimal_when_registry_exceeds_two_windows(monkeypatch):
    """The r11 regime: 104 registered queries vs a 50-slot window means
    two rounds can cover at most 100 names — a strict two-round
    guarantee is structurally impossible, so the selection must be
    OPTIMAL instead: given today's real distribution (22 last-green r8,
    26 r9, 50 r10, 6 never-checked, 62 touched), the window must take
    every never-checked query and the stalest remainder, dropping
    exactly the 4 least-stale of the 54-name must-check set (the
    minimum possible shortfall), and those 4 must lead the next round."""
    monkeypatch.setattr(registry, "_union_deadline", lambda: -10)
    W = 50
    names, last, touched = [], {}, set()
    for grp, (cnt, rnd) in enumerate([(22, 8), (26, 9), (50, 10), (6, None)]):
        for i in range(cnt):
            n = f"g{grp}_{i:02d}"
            names.append(n)
            if rnd is not None:
                last[n] = rnd
    # 62 touched: all 6 new, plus a spread of old ones (mirrors r11)
    touched = {n for n in names if n.startswith("g3_")} | set(names[:56])
    spec = {
        n: (registry.QuerySpec(name=n, spark=lambda s, d: None), n in touched)
        for n in names
    }
    monkeypatch.setattr(registry, "_driver_window", lambda: W)
    monkeypatch.setattr(registry, "_specs_with_touched", lambda: dict(spec))
    monkeypatch.setattr(registry, "_last_green_round", lambda: dict(last))

    window = list(registry.all_queries())[:W]
    must = [n for n in names if last.get(n, -1) <= 9]
    assert len(must) == 54
    missed = [n for n in must if n not in window]
    # optimal: only the structurally-impossible excess misses, and it is
    # the LEAST stale slice of the must-check set (r9, never r8 or new)
    assert len(missed) == len(must) - W == 4
    assert all(last[n] == 9 for n in missed)
    assert all(n in window for n in names if n not in last)  # new all in

    # next round: the 4 dropped lead the must-check and are selected
    nxt = dict(last)
    for n in window:
        nxt[n] = 11
    monkeypatch.setattr(registry, "_last_green_round", lambda: dict(nxt))
    window2 = list(registry.all_queries())[:W]
    assert all(n in window2 for n in missed)


def test_hub_edit_drop_warns(monkeypatch):
    """r10 ADVICE item 5: dropping a span-everything hub edit from
    pinning must be a VISIBLE decision — a warning, not silence."""
    import warnings

    from clickhouse_segments_tutorial_spark.plans import touched as tmod

    qmods = registry._query_module_paths()
    monkeypatch.setattr(
        tmod,
        "touched_modules_by_change",
        lambda repo_root=None: {
            f"{PKG}/plans/registry.py": set(qmods) | {f"{PKG}/plans/registry.py"}
        },
    )
    monkeypatch.setattr(registry, "_TOUCHED_CACHE", None)
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            assert registry._touched_module_paths() == set()
        assert any("hub edit" in str(w.message) for w in caught)
    finally:
        monkeypatch.setattr(registry, "_TOUCHED_CACHE", None)


def test_union_deadline_block_preempts_pins(monkeypatch):
    """r17: names whose latest green row is about to age out of the
    judge's 4-round coverage union take the window BEFORE the pinned
    block. Scenario (the real r17 shape in miniature): a broad operator
    edit pins a module full of recently-green queries while as many
    other names as the window holds sit on the deadline — under the old
    pins-first order the pins displace deadline names and the union
    breaks; under deadline-first every deadline name (and every
    never-checked name) is in the window, pins fill what remains."""
    W = 10
    names = (
        [f"old{i}" for i in range(8)]      # last green R-3: deadline
        + ["brandnew"]                      # never checked: deadline
        + [f"pin{i}" for i in range(6)]    # green last round, touched
        + [f"mid{i}" for i in range(4)]    # green R-1, untouched
    )
    last = {f"old{i}": 7 for i in range(8)}
    last |= {f"pin{i}": 10 for i in range(6)}
    last |= {f"mid{i}": 9 for i in range(4)}
    pinned = {n for n in names if n.startswith("pin")}
    spec = {
        n: (registry.QuerySpec(name=n, spark=lambda s, d: None), n in pinned)
        for n in names
    }
    monkeypatch.setattr(registry, "_driver_window", lambda: W)
    monkeypatch.setattr(registry, "_specs_with_touched", lambda: dict(spec))
    monkeypatch.setattr(registry, "_last_green_round", lambda: dict(last))
    # newest recorded round 10 -> current round 11, union rounds 8..11,
    # so lg < 8 has a hard deadline this round
    monkeypatch.setattr(registry, "_union_deadline", lambda: 8)

    window = list(registry.all_queries())[:W]
    # every deadline name is in, never-checked first among them is fine
    assert all(f"old{i}" in window for i in range(8))
    assert "brandnew" in window
    # the single remaining slot goes to a pin, not a mid
    assert len([n for n in window if n in pinned]) == 1
    assert not any(n.startswith("mid") for n in window)
    # deadline block leads and is staleness-ordered (never-checked first)
    assert window[0] == "brandnew"
    assert set(window[1:9]) == {f"old{i}" for i in range(8)}

    # with no deadline pressure the pins lead again (old behavior):
    # pin_cap = W//2 = 5 of the 6 pins head the window, the sixth
    # overflows into the staleness pool as before
    monkeypatch.setattr(registry, "_union_deadline", lambda: -10)
    window2 = list(registry.all_queries())[:W]
    assert len([n for n in window2 if n in pinned]) == 5
    assert set(window2[:5]) <= pinned


def test_must_sample_tier_outranks_deadline_block(monkeypatch):
    """r18: a ROUND_MUST_SAMPLE name (a standing red cell whose clearing
    hash row the round MUST produce, or a VERDICT-mandated sample) takes
    the window ahead of even the union-deadline block — at the r18
    record state the deadline block alone filled positions 0..42, which
    pushed the plain override past the 50-row window and the red topkw
    cell would never have been re-hashed. The tier must not displace
    deadline names while must+deadline fit the window together."""
    W = 10
    names = (
        [f"old{i}" for i in range(8)]      # last green R-3: deadline
        + ["redcell"]                       # green last round BUT must-sample
        + [f"pin{i}" for i in range(3)]    # green last round, touched
    )
    last = {f"old{i}": 7 for i in range(8)}
    last |= {"redcell": 10}
    last |= {f"pin{i}": 10 for i in range(3)}
    pinned = {n for n in names if n.startswith("pin")} | {"redcell"}
    spec = {
        n: (registry.QuerySpec(name=n, spark=lambda s, d: None), n in pinned)
        for n in names
    }
    monkeypatch.setattr(registry, "_driver_window", lambda: W)
    monkeypatch.setattr(registry, "_specs_with_touched", lambda: dict(spec))
    monkeypatch.setattr(registry, "_last_green_round", lambda: dict(last))
    monkeypatch.setattr(registry, "_union_deadline", lambda: 8)
    monkeypatch.setattr(registry, "ROUND_MUST_SAMPLE", frozenset({"redcell"}))
    monkeypatch.setattr(registry, "ROUND_TOUCHED_OVERRIDE", frozenset())

    ordered = list(registry.all_queries())
    window = ordered[:W]
    # the must name leads the whole order, ahead of the deadline block
    assert ordered[0] == "redcell"
    # every deadline name still fits (1 must + 8 deadline <= 10)
    assert all(f"old{i}" in window for i in range(8))
    # the remaining slot goes to a pin as before
    assert len([n for n in window if n.startswith("pin")]) == 1
