"""The driver-verification window is GENERATED, not hand-kept.

VERDICT r7 item 2: the old hand-maintained ``_DRIVER_WINDOW`` silently
ignored unknown names, so a rename could drop a query from driver
verification forever. These tests pin the contract of
``tools/gen_driver_window.py``:

  * the committed window is a fixed point of the generator (stale
    windows fail CI, not silently skip),
  * window <-> registry is a bijection (no unknown, no missing, no
    duplicate names),
  * rotation invariants: every not-yet-driver-verified name precedes
    every verified-green name.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from gen_driver_window import (  # noqa: E402
    REGISTRY_PY,
    build_window,
    entry_passes,
    load_evidence,
    render_block,
    rounds_from_source,
    splice,
)

from spark_streaming_test_spark import registry  # noqa: E402


@pytest.fixture(scope="module")
def recorded_rounds():
    # The window header records which CORRECTNESS rounds it was built
    # from. Regenerating against exactly those rounds means a driver
    # artifact written AFTER the builder's session closes (the r8
    # failure mode) cannot redden the committed suite; the round-start
    # `gen_driver_window.py --check` ritual still catches it.
    rounds = rounds_from_source()
    assert rounds is not None, (
        "window header lacks an evidence-rounds line — run "
        "`python tools/gen_driver_window.py`"
    )
    return rounds


@pytest.fixture(scope="module")
def generated(recorded_rounds):
    return build_window(recorded_rounds)


def test_window_is_generator_fixed_point(generated, recorded_rounds):
    _, sections = generated
    src = open(REGISTRY_PY).read()
    assert splice(src, render_block(sections, recorded_rounds)) == src, (
        "registry.py _DRIVER_WINDOW is stale — run "
        "`python tools/gen_driver_window.py`"
    )


def test_window_registry_bijection():
    registry._load()
    window = registry._DRIVER_WINDOW
    assert len(window) == len(set(window)), "duplicate names in window"
    assert set(window) == set(registry._REGISTRY), (
        "window and registry must contain exactly the same names; "
        f"window-only={set(window) - set(registry._REGISTRY)} "
        f"registry-only={set(registry._REGISTRY) - set(window)}"
    )


def test_unverified_precede_greens(generated):
    names, sections = generated
    greens = set(sections["green"])
    first_green = min(
        (i for i, n in enumerate(names) if n in greens), default=len(names)
    )
    late_unverified = [n for n in names[first_green:] if n not in greens]
    assert not late_unverified, (
        f"unverified names scheduled after greens: {late_unverified[:5]}"
    )


def test_all_queries_order_matches_window(generated):
    names, _ = generated
    assert list(registry.all_queries()) == names


def test_no_oracle_pass_requires_missing_oracle():
    # A 'no_oracle' driver record only counts as a pass when the
    # registry truly declares no oracle (graph_mst_boruvka's r6 red
    # was exactly this case: oracle existed, driver saw none).
    rec = {"err": "no_oracle", "spark_rows": 10}
    assert entry_passes(rec, has_oracle=False)
    assert not entry_passes(rec, has_oracle=True)
    assert entry_passes(
        {"rows_match": True, "schema_match": True, "hash_match": True},
        has_oracle=True,
    )
    assert not entry_passes(
        {"rows_match": True, "schema_match": True, "hash_match": False},
        has_oracle=True,
    )


def test_evidence_union_matches_green_section(generated, recorded_rounds):
    _, sections = generated
    registry._load()
    evidence = load_evidence(rounds=recorded_rounds)
    oracles = {n: q.oracle is not None for n, q in registry._REGISTRY.items()}
    greens = {
        n
        for n, (rnd, rec) in evidence.items()
        if n in oracles and entry_passes(rec, oracles[n])
    }
    assert greens == set(sections["green"])
    assert set(sections["red"]) == {
        n
        for n, (rnd, rec) in evidence.items()
        if n in oracles and not entry_passes(rec, oracles[n])
    }
