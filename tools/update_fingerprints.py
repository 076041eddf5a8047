"""Maintain tools/query_fingerprints.json — the content fingerprints
stamped at each query's last driver verification.

The rotation in __spark_entry__._ordered_names treats a query whose
CURRENT fingerprint (oracle SQL + impl source, see
__spark_entry__.query_fingerprint) differs from its stamped one as
unverified, pulling it to the front of the driver's 50-query window.
This tool is the stamping side:

  python tools/update_fingerprints.py            # stamp queries with a
        green hash_match row in the LATEST CORRECTNESS_r*.json
  python tools/update_fingerprints.py --all      # stamp every query
        (use only when local verify_oracle covered the full surface)
  python tools/update_fingerprints.py --invalidate nameA nameB
        # drop stamps (e.g. a shared helper changed under its queries)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod

FP_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "query_fingerprints.json")


def _latest_green() -> set[str]:
    best_round, best = -1, {}
    for path in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        m = re.search(r"CORRECTNESS_r(\d+)", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if rnd > best_round:
            try:
                with open(path) as f:
                    rec = json.load(f)
            except (OSError, ValueError):
                continue
            if isinstance(rec, dict):
                best_round, best = rnd, rec
    return {n for n, row in best.items()
            if isinstance(row, dict) and row.get("hash_match")}


def main() -> None:
    args = sys.argv[1:]
    stored = entrymod._stored_fingerprints()
    fns, sql = entrymod._bases()
    if args and args[0] == "--invalidate":
        dropped = [n for n in args[1:] if stored.pop(n, None) is not None]
        print(f"invalidated {len(dropped)}: {dropped}")
    else:
        stamp = set(fns) if "--all" in args else _latest_green() & set(fns)
        for n in sorted(stamp):
            stored[n] = entrymod.query_fingerprint(n, fns[n], sql.get(n))
        print(f"stamped {len(stamp)} of {len(fns)} queries")
    with open(FP_PATH, "w") as f:
        json.dump(dict(sorted(stored.items())), f, indent=1)
    print(f"wrote {FP_PATH} ({len(stored)} entries)")


if __name__ == "__main__":
    main()
