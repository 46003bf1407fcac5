"""Minimal Praat TextGrid reader (long format).

The reference used the ``textgrid`` package (``data_utils.py:246,365``)
solely to read word intervals from tier 0; this native reader covers that:
``read_textgrid(path)[0]`` -> list of (min_time, max_time, mark).
"""

from __future__ import annotations

import re
from typing import List, NamedTuple


class Interval(NamedTuple):
    min_time: float
    max_time: float
    mark: str


def read_textgrid(path: str) -> List[List[Interval]]:
    with open(path, encoding="utf-8", errors="replace") as f:
        text = f.read()
    tiers: List[List[Interval]] = []
    # split on tier items; the long format marks each tier with 'item [n]:'
    tier_chunks = re.split(r"item\s*\[\d+\]\s*:", text)[1:]
    for chunk in tier_chunks:
        intervals = []
        for m in re.finditer(
            r"intervals\s*\[\d+\]\s*:\s*"
            r"xmin\s*=\s*([\d.eE+-]+)\s*"
            r"xmax\s*=\s*([\d.eE+-]+)\s*"
            r'text\s*=\s*"((?:[^"]|"")*)"',
            chunk,
        ):
            intervals.append(Interval(
                float(m.group(1)), float(m.group(2)),
                m.group(3).replace('""', '"')))
        tiers.append(intervals)
    return tiers
