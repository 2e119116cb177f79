"""Local gate vs driver gate: canonicalization parity (VERDICT r10 #3).

The round-10 red proved the two gates can canonicalize differently:
``tests/compare.py`` normalized -0.0 to +0.0 while the driver's pandas
value hash is over the raw float64 bits, so the local 608-query sweep
stayed green while the driver went red. The invariant these tests pin
is the STRICTNESS DIRECTION:

    local-gate equal  =>  driver-replica equal        (for every class)

i.e. the local gate may be tighter than the driver but NEVER looser —
any value pair the driver's pandas hash distinguishes must also be
distinguished by ``tests/compare._canon``. The driver replica here is
``pandas.util.hash_pandas_object`` over a single-column frame, the
same primitive the external harness canonicalizes through.

Battery coverage: every scalar class an oracle query can emit (float
incl. signed zero / NaN payloads / denormals / infinities, int, bool,
str incl. NFC-vs-NFD, bytes, date, naive + tz-aware datetime, Decimal,
NULL) plus cross-class pairs, exhaustively pairwise within class.
"""

from __future__ import annotations

import datetime as dt
import itertools
import math
import struct
import unicodedata
from decimal import Decimal

import pandas as pd
import pytest
from pandas.util import hash_pandas_object

from tests.compare import _canon, canon_table


def _bits(h: str) -> float:
    return struct.unpack("<d", struct.pack("<Q", int(h, 16)))[0]


QNAN = _bits("7ff8000000000000")  # canonical quiet NaN
PNAN = _bits("7ff8000000000001")  # same NaN, different payload

_UTC = dt.timezone.utc
_PLUS2 = dt.timezone(dt.timedelta(hours=2))

# Pairwise-compared within class; the driver replica sees each value
# as its own single-column frame (per-engine columns are homogeneous,
# so dtype inference per value mirrors the real frames).
_CLASSES: dict[str, list] = {
    "float": [
        0.0, -0.0, 1.0, 1.0 + 2**-52, -1.0, math.inf, -math.inf,
        QNAN, PNAN, 5e-324, -5e-324, 1e308, 0.1,
        0.3, 0.30000000000000004,  # adjacent doubles around 0.3
    ],
    "int": [0, 1, -1, 2**53, 2**53 + 1, 2**62, -(2**63)],
    "bool": [True, False],
    "str": [
        "", "a", "A", "a b", "a\tb", "a\x00b",
        unicodedata.normalize("NFC", "é"),
        unicodedata.normalize("NFD", "é"),
    ],
    "date": [dt.date(2020, 1, 1), dt.date(2020, 1, 2)],
    "datetime": [
        dt.datetime(2020, 1, 1, 12, 0, 0),
        dt.datetime(2020, 1, 1, 12, 0, 0, tzinfo=_UTC),
        dt.datetime(2020, 1, 1, 12, 0, 0, tzinfo=_PLUS2),
        dt.datetime(2020, 1, 1, 10, 0, 0),
        dt.datetime(2020, 1, 1, 12, 0, 0, 1),
    ],
    "decimal": [
        Decimal("1.5"), Decimal("1.50"), Decimal("-1.5"),
        Decimal("0"), Decimal("0.00"), Decimal("-0.00"),
        Decimal("0.1"),
        Decimal("0.1000000000000000000000001"),  # below double ulp
    ],
    "none": [None],
}

# Cross-class pairs: local is unequal by tag, so the implication is
# vacuous — included to prove neither gate crashes on them.
_CROSS = [
    (None, QNAN), (True, 1), (1, 1.0), ("1", 1),
    (dt.date(2020, 1, 1), dt.datetime(2020, 1, 1)),
    (Decimal("1"), 1), (Decimal("1.5"), 1.5),
]


def _driver_equal(a, b) -> bool | None:
    """The driver's verdict for a single-column pair, or None when
    pandas cannot hash the value at all (complex types — rejected
    upstream by assert_types_match before any value compare)."""
    try:
        ha = hash_pandas_object(pd.Series([a]), index=False).iloc[0]
        hb = hash_pandas_object(pd.Series([b]), index=False).iloc[0]
    except TypeError:
        return None
    return bool(ha == hb)


def _local_equal(a, b) -> bool:
    return _canon(a) == _canon(b)


def _pairs():
    for cls, vals in _CLASSES.items():
        for a, b in itertools.combinations_with_replacement(vals, 2):
            yield pytest.param(a, b, id=f"{cls}:{a!r}~{b!r}")
    for a, b in _CROSS:
        yield pytest.param(a, b, id=f"cross:{a!r}~{b!r}")


@pytest.mark.parametrize("a,b", _pairs())
def test_local_gate_never_looser_than_driver(a, b):
    """local-equal => driver-equal, for every canonicalizable pair."""
    if _local_equal(a, b):
        d = _driver_equal(a, b)
        assert d is not False, (
            f"canonicalization divergence: local gate equates {a!r} and "
            f"{b!r} but the driver's pandas hash distinguishes them — "
            "the local sweep would stay green while the driver goes red"
        )


def test_known_divergence_classes_are_caught_locally():
    """The concrete classes that did (or could) slip past the old
    gate now fail locally: signed zero (the r10 red), NaN payload
    bits, sub-double-ulp Decimal differences, and a non-UTC tz-aware
    datetime vs its naive wall-clock twin."""
    assert not _local_equal(0.0, -0.0)
    assert not _local_equal(QNAN, PNAN)
    assert _local_equal(QNAN, QNAN)  # same bits still equal
    assert not _local_equal(
        Decimal("0.1"), Decimal("0.1000000000000000000000001")
    )
    naive = dt.datetime(2020, 1, 1, 12, 0, 0)
    assert not _local_equal(naive, naive.replace(tzinfo=_PLUS2))
    # UTC-aware vs naive same wall IS equal — matching pandas i8
    # semantics (and the only aware form this environment produces).
    assert _local_equal(naive, naive.replace(tzinfo=_UTC))
    assert _driver_equal(naive, naive.replace(tzinfo=_UTC))


def test_table_level_verdict_agreement():
    """Whole-table form: canon_table and a frame-level driver replica
    agree on a green twin and on the r10 signed-zero red."""

    def driver_digest(cols, rows):
        df = pd.DataFrame(rows, columns=cols)
        df = df[sorted(df.columns)]
        h = hash_pandas_object(df, index=False)
        return sorted(h.tolist())

    cols = ["k", "v"]
    base = [(1, 1.25), (2, 0.0)]
    twin = [(2, 0.0), (1, 1.25)]  # order-insensitive green
    red = [(1, 1.25), (2, -0.0)]  # the r10 class
    assert canon_table(cols, base) == canon_table(cols, twin)
    assert driver_digest(cols, base) == driver_digest(cols, twin)
    assert canon_table(cols, base) != canon_table(cols, red)
    assert driver_digest(cols, base) != driver_digest(cols, red)
