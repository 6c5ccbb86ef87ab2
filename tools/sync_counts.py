#!/usr/bin/env python
"""Rewrite the registry-count figures in README.md / SURVEY.md from the
LIVE ``__spark_entry__.queries()`` registry — the counts drifted twice
during round 7 before manual syncs; this makes the sync mechanical.

Usage:  python tools/sync_counts.py      (writes files, prints the count)
        python tools/sync_counts.py --check   (exit 1 if docs are stale)
"""

from __future__ import annotations

import argparse
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    n = len(entry.queries())
    n_oracle = len(entry.oracle_sql())
    patterns = [
        (
            os.path.join(REPO, "README.md"),
            [(r"the \d+ named, oracle-checked", f"the {n} named, oracle-checked")],
        ),
        (
            os.path.join(REPO, "SURVEY.md"),
            [
                (
                    r"\(\d+ `queries\(\)` entries, ALL \d+",
                    f"({n} `queries()` entries, ALL {n_oracle}",
                )
            ],
        ),
    ]
    stale = False
    for path, subs in patterns:
        text = open(path).read()
        new = text
        for pat, repl in subs:
            new = re.sub(pat, repl, new)
        if new != text:
            stale = True
            if not args.check:
                open(path, "w").write(new)
    print(f"registry={n} oracles={n_oracle} stale_docs={stale}")
    return 1 if (args.check and stale) else 0


if __name__ == "__main__":
    sys.exit(main())
