#!/usr/bin/env python
"""Regenerate ``_DRIVER_WINDOW`` in registry.py from driver evidence.

The driver hash-verifies the FIRST ~50 names of ``all_queries()`` each
round and records the results in ``CORRECTNESS_r*.json``. This tool
derives the rotation order from that evidence instead of a hand-kept
list (VERDICT r7 item 2 — a hand-edit rename silently dropped names
from verification because unknown names were ignored):

    1. RED     — latest sampled round failed (hash/schema/row mismatch,
                 error, or a ``no_oracle`` record for a query that DOES
                 declare an oracle in the registry). Re-verify first.
    2. NEW     — registered but absent from the current window (fresh
                 code this round carries the highest risk). Registry
                 order.
    3. BACKLOG — never driver-sampled. Keeps the current window's
                 relative order (the stable planned rotation).
    4. GREEN   — latest sampled round passed. Re-verify last, stalest
                 green first (ascending round of last verification).

Classification of one CORRECTNESS entry:
    pass  = rows+schema+hash all true, OR err == 'no_oracle' for a
            query whose registry entry has oracle=None (rows-only is
            that query's best achievable check).
    fail  = anything else.

Unlike the old hand-kept list, a window name that no longer exists in
the registry is a HARD ERROR (renames must be resolved consciously),
and a registered query missing from the window is impossible by
construction (the window is generated from the registry).

Usage:
    python tools/gen_driver_window.py            # rewrite registry.py
    python tools/gen_driver_window.py --check    # exit 1 if stale
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import textwrap

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

REGISTRY_PY = os.path.join(ROOT, "spark_streaming_test_spark", "registry.py")

BEGIN = "_DRIVER_WINDOW = ["
# The closing bracket of the window list, at column 0.
END = "]"


def evidence_rounds_on_disk(root: str = ROOT) -> list[int]:
    """Round numbers of every CORRECTNESS_r*.json currently present."""
    rounds = []
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rounds.append(int(m.group(1)))
    return sorted(rounds)


def rounds_from_source() -> list[int] | None:
    """Evidence rounds recorded in the committed window header, or None
    if the header predates round tracking. The driver writes
    CORRECTNESS_r{N}.json AFTER the builder's session closes; tests
    regenerate against the RECORDED rounds so that post-session artifact
    can never redden the committed suite (VERDICT r8 item 1). The
    --check mode still compares against all on-disk evidence, so the
    round-start ritual (rerun the tool) stays enforced by the tool."""
    src = open(REGISTRY_PY).read()
    m = re.search(r"#\s*evidence-rounds:\s*([\d, ]*)", src)
    if not m:
        return None
    text = m.group(1).strip()
    return [int(x) for x in text.split(",")] if text else []


def load_evidence(
    root: str = ROOT, rounds: list[int] | None = None
) -> dict[str, tuple[int, dict]]:
    """name -> (latest round number, that round's record).

    ``rounds`` restricts which CORRECTNESS files are consulted; None
    means every file on disk."""
    latest: dict[str, tuple[int, dict]] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        if rounds is not None and rnd not in rounds:
            continue
        for name, rec in json.load(open(path)).items():
            if name not in latest or rnd > latest[name][0]:
                latest[name] = (rnd, rec)
    return latest


def entry_passes(rec: dict, has_oracle: bool) -> bool:
    if rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match"):
        return True
    if (
        rec.get("err") == "no_oracle"
        and not has_oracle
        and rec.get("spark_rows") is not None
    ):
        # Rows-only queries (stubs, live-streaming shapes): the driver's
        # weaker rows-run check is their best achievable verification.
        return True
    return False


def _window_from_source() -> list[str]:
    """Parse the committed _DRIVER_WINDOW straight from registry.py —
    NOT from the imported module, so the convergence loop in main()
    sees each rewrite without reloading (a reload would wipe the
    populated _REGISTRY: query modules only register on first import)."""
    import ast

    src = open(REGISTRY_PY).read()
    start = src.index(BEGIN) + len(BEGIN) - 1  # keep the '['
    end = src.index("\n" + END + "\n", start) + 1 + len(END)
    return list(ast.literal_eval(src[start:end]))


def build_window(
    rounds: list[int] | None = None,
) -> tuple[list[str], dict[str, list[str]]]:
    """Return (ordered names, section map) derived from the registry +
    CORRECTNESS evidence (optionally restricted to ``rounds``) + the
    current window's relative order."""
    from spark_streaming_test_spark import registry

    registry._load()
    reg_names = list(registry._REGISTRY)
    reg_set = set(reg_names)
    oracles = {n: registry._REGISTRY[n].oracle is not None for n in reg_names}

    old = _window_from_source()
    stale = [n for n in old if n not in reg_set]
    if stale:
        raise SystemExit(
            "gen_driver_window: window names missing from the registry "
            f"(rename or removal must be resolved here): {stale}"
        )
    old_rank = {n: i for i, n in enumerate(old)}

    evidence = load_evidence(rounds=rounds)
    reds, news, backlog, greens = [], [], [], []
    for n in reg_names:
        if n in evidence:
            rnd, rec = evidence[n]
            (greens if entry_passes(rec, oracles[n]) else reds).append(n)
        elif n in old_rank:
            backlog.append(n)
        else:
            news.append(n)

    reds.sort(key=lambda n: old_rank.get(n, -1))
    backlog.sort(key=lambda n: old_rank[n])
    # Stalest green first so long-unverified names cycle back sooner.
    greens.sort(key=lambda n: (evidence[n][0], old_rank.get(n, -1)))
    sections = {"red": reds, "new": news, "backlog": backlog, "green": greens}
    return reds + news + backlog + greens, sections


def render_block(
    sections: dict[str, list[str]], rounds: list[int] | None = None
) -> str:
    """The generated source text for the _DRIVER_WINDOW assignment.

    ``rounds`` (the CORRECTNESS rounds consulted) is recorded in the
    header so tests can regenerate against exactly this evidence set —
    a driver artifact written after the session closes then cannot
    redden the committed suite."""
    headers = {
        "red": "failed in their latest driver sample — re-verify FIRST",
        "new": "registered since the last regeneration — verify before backlog",
        "backlog": "never driver-sampled — planned rotation order",
        "green": "driver-green — re-verify last, stalest first",
    }
    out = [BEGIN]
    out.append(
        "    # GENERATED by tools/gen_driver_window.py — do not hand-edit."
    )
    out.append(
        "    # Derived from CORRECTNESS_r*.json: reds, then new names, then"
    )
    out.append(
        "    # the never-sampled backlog, then greens (stalest first)."
    )
    if rounds is None:
        rounds = evidence_rounds_on_disk()
    out.append(
        "    # evidence-rounds: " + ", ".join(str(r) for r in rounds)
    )
    for key in ("red", "new", "backlog", "green"):
        names = sections[key]
        out.append(f"    # --- {headers[key]} ({len(names)}) ---")
        if not names:
            continue
        body = ", ".join(f'"{n}"' for n in names) + ","
        out.extend(
            textwrap.wrap(
                body,
                width=78,
                initial_indent="    ",
                subsequent_indent="    ",
                break_long_words=False,
                break_on_hyphens=False,
            )
        )
    out.append(END)
    return "\n".join(out)


def splice(src: str, block: str) -> str:
    start = src.index(BEGIN)
    end = src.index("\n" + END + "\n", start) + 1 + len(END)
    return src[:start] + block + src[end:]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    rounds = evidence_rounds_on_disk()
    _, sections = build_window(rounds)
    block = render_block(sections, rounds)
    src = open(REGISTRY_PY).read()
    new_src = splice(src, block)
    if args.check:
        if new_src != src:
            print("gen_driver_window: registry.py window is STALE — rerun the tool")
            return 1
        print("gen_driver_window: window up to date")
        return 0
    if new_src == src:
        print("gen_driver_window: no change")
        return 0
    open(REGISTRY_PY, "w").write(new_src)
    counts = {k: len(v) for k, v in sections.items()}
    print(f"gen_driver_window: rewrote window {counts}")
    # A name classified "new" becomes "backlog" once it's in the window,
    # so one rewrite may not be a fixed point — iterate until it is
    # (same order, only section labels move; bounded by construction).
    for _ in range(3):
        _, sections = build_window(rounds)
        block = render_block(sections, rounds)
        src = open(REGISTRY_PY).read()
        new_src = splice(src, block)
        if new_src == src:
            return 0
        open(REGISTRY_PY, "w").write(new_src)
        counts = {k: len(v) for k, v in sections.items()}
        print(f"gen_driver_window: converging, rewrote again {counts}")
    raise SystemExit("gen_driver_window: window failed to converge")


if __name__ == "__main__":
    raise SystemExit(main())
