"""Fixture-cache revisioning.

Scratch fixtures (pcap captures, BMP/WAV files) are generated once from
closed-form formulas and cached on disk; their DuckDB oracles recompute
the SAME formulas independently. Caching by file existence alone is a
trap: edit the formula or a size constant and the stale binary is
silently reused, so the resulting oracle mismatch masquerades as a
parser bug (ADVICE r5). :func:`fixture_rev` hashes the generation
recipe — the generator/writer function SOURCE plus every constant that
feeds it — into a short tag embedded in the fixture filename, so any
change to the recipe changes the name and forces regeneration. Stale
revisions are left behind in .scratch (bytes are tiny) rather than
cleaned, keeping the helper race-free under parallel pytest workers.
"""

from __future__ import annotations

import hashlib
import inspect


def fixture_rev(*parts) -> str:
    """8-hex-digit digest of the fixture generation recipe.

    Pass the generator/writer callables and every constant the formulas
    use; callables contribute their full source text, everything else
    its ``repr``.
    """
    h = hashlib.md5()
    for p in parts:
        if callable(p):
            h.update(inspect.getsource(p).encode())
        else:
            h.update(repr(p).encode())
    return h.hexdigest()[:8]


import os as _os

_SCRATCH = "/root/repo/.scratch"


def scratch_dir(sf_dir: str, name: str) -> str:
    """Per-SF scratch directory for write→read roundtrip queries.

    Unlike the content-addressed read-only fixtures above, roundtrip
    queries OVERWRITE their scratch path on every invocation — so two
    harness processes running at different SFs (a sweep and the pytest
    suite, or two concurrent sweeps) must not share one path: Hadoop's
    overwrite first deletes the other process's in-flight _temporary
    attempt files (observed r12: chmod-on-missing-file task failure at
    sf0.1), and even a "successful" race reads the other SF's rows.
    Qualifying by the SF tag makes every cross-SF combination safe —
    same-SF concurrency remains out of contract, as everywhere else in
    the harness.
    """
    tag = _os.path.basename(_os.path.normpath(sf_dir))
    return _os.path.join(_SCRATCH, f"{name}_{tag}")
