"""Minimal Praat TextGrid parser (replaces the `tgt` dependency).

Parses IntervalTier items from standard (long-form) TextGrid files —
enough to read MFA alignment "phones" tiers the way the reference does
(reference flamed/data/dataset.py:270 via tgt.io.read_textgrid with
include_empty_intervals=True).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Dict, List


@dataclass
class Interval:
    start_time: float
    end_time: float
    text: str


_ITEM_RE = re.compile(r"item\s*\[\s*(\d+)\s*\]\s*:")
_KV_RE = re.compile(r"^\s*(\w+)\s*=\s*(.*)$")


def _unquote(value: str) -> str:
    value = value.strip()
    if value.startswith('"') and value.endswith('"'):
        return value[1:-1]
    return value


def read_textgrid(path: str) -> Dict[str, List[Interval]]:
    """Returns {tier_name: [Interval, ...]} with empty intervals kept."""
    with open(path, encoding="utf-8") as fin:
        lines = fin.readlines()

    tiers: Dict[str, List[Interval]] = {}
    current_name = None
    current: List[Interval] = []
    pending: Dict[str, str] = {}
    in_interval = False

    for raw in lines:
        line = raw.strip()
        if line.startswith("name"):
            match = _KV_RE.match(line)
            if match:
                if current_name is not None:
                    tiers[current_name] = current
                current_name = _unquote(match.group(2))
                current = []
            continue
        if re.match(r"intervals\s*\[", line):
            if pending.get("xmin") is not None and "text" in pending:
                current.append(
                    Interval(
                        float(pending["xmin"]),
                        float(pending["xmax"]),
                        _unquote(pending["text"]),
                    )
                )
            pending = {}
            in_interval = True
            continue
        if in_interval:
            match = _KV_RE.match(line)
            if match:
                pending[match.group(1)] = match.group(2)

    if in_interval and pending.get("xmin") is not None and "text" in pending:
        current.append(
            Interval(
                float(pending["xmin"]),
                float(pending["xmax"]),
                _unquote(pending["text"]),
            )
        )
    if current_name is not None:
        tiers[current_name] = current
    return tiers


def get_tier(path: str, tier_name: str = "phones") -> List[Interval]:
    tiers = read_textgrid(path)
    if tier_name not in tiers:
        raise KeyError(f"Tier '{tier_name}' not found in {path} (has {list(tiers)})")
    return tiers[tier_name]
