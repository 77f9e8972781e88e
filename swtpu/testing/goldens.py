"""Parsers for the reference repo's golden score files.

Three independent oracles agree in the reference (SURVEY.md §0) and swtpu
tests against all of them:

1. RTL simulation outputs `data/<db>.fa_<query>.fa_out.txt` — lines like
   ``@   566ns:       >db1 score:         133`` written by the ScoreBank
   testbench (ScoreBank/ScoreBank_v1_tb.sv:280-282).
2. swalign dumps `data/sw_testing.txt` (``Score: 133`` blocks per read).
3. ssearch36 `-R` score tables `data/score.txt` / `data/score500.txt`
   (name, len, ..., score in column 6; see data/ssearch36_command).
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Dict

REFERENCE_DATA_DIR = Path(
    os.environ.get("SWTPU_REFERENCE_DATA", "/root/reference/data")
)

_RTL_LINE = re.compile(r"@\s*\d+\s*ns:\s*>(\S+)\s+score:\s*(-?\d+)")


def reference_data_available() -> bool:
    return REFERENCE_DATA_DIR.is_dir()


def parse_rtl_out_file(path: Path) -> Dict[str, int]:
    """Parse an RTL `*_out.txt` golden into {read_name: score}.

    Some goldens are partial simulation runs (e.g. data40: 16/40 lines,
    SURVEY.md §2.6) — callers should compare per-ID, not by count."""
    scores: Dict[str, int] = {}
    with open(path) as f:
        for line in f:
            m = _RTL_LINE.search(line)
            if m:
                scores[m.group(1)] = int(m.group(2))
    return scores


def parse_ssearch_scores(path: Path) -> Dict[str, int]:
    """Parse an ssearch36 -R score table into {read_name: score}."""
    scores: Dict[str, int] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or line.startswith(">>>"):
                continue
            parts = line.split()
            if len(parts) < 6:
                continue
            try:
                scores[parts[0]] = int(parts[5])
            except ValueError:
                continue
    return scores


def parse_swalign_dump(path: Path) -> Dict[str, int]:
    """Parse a sw-testing.py dump (`=== dbK: ===` blocks with `Score: S`)."""
    scores: Dict[str, int] = {}
    name = None
    with open(path) as f:
        for line in f:
            m = re.search(r"=+\s*(\S+?):\s*=+", line)
            if m:
                name = m.group(1)
                continue
            m = re.match(r"Score:\s*(-?\d+)", line.strip())
            if m and name is not None:
                scores[name] = int(m.group(1))
                name = None
    return scores
