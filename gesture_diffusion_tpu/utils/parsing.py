"""Human-readable step-count parsing.

Parity with the reference's ``parse_steps`` (``utils/string_parser.py:1-12``)
for its operational inputs ("200k" -> 200_000, "4k" -> 4_000).  The
reference multiplies by ``count('k') * 1000`` which makes "100kk" mean 2e5;
we implement the sane semantics ``value * 1000 ** count('k')`` and also
accept an ``m`` suffix (1e6).
"""

from __future__ import annotations


def parse_steps(steps: "str | int | float") -> int:
    if isinstance(steps, (int, float)):
        return int(steps)
    s = str(steps).strip().lower()
    mult = 1
    while s and s[-1] in "km":
        mult *= 1000 if s[-1] == "k" else 1_000_000
        s = s[:-1]
    if not s:
        raise ValueError(f"Cannot parse step count: {steps!r}")
    return int(float(s) * mult)
