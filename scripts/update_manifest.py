"""Refresh scripts/oracle_manifest.json from a round's CORRECTNESS_r{N}.json.

The manifest drives the mechanical queries()/oracle_sql() ordering in
__spark_entry__.py (see registry_order there): each entry records the
definition hash (query function source + oracle SQL) AT THE TIME the driver
last verified it, plus that round number. Run this at the START of a round,
once the driver's CORRECTNESS file for the previous round exists and HEAD is
still the commit the driver ran against:

    python scripts/update_manifest.py CORRECTNESS_r05.json 5

Only fully-green entries (rows + schema + value-hash match, no error) are
recorded; a red or errored entry keeps its old manifest state, so it stays
in the changed/stale block and gets re-verified next round.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def green(row: dict) -> bool:
    return (
        row.get("err") is None
        and row.get("rows_match") is True
        and row.get("schema_match") is True
        and row.get("hash_match") is not False  # rows-only checks pass as None
    )


def main(correctness_path: str, round_no: int) -> None:
    import __spark_entry__ as entry

    with open(correctness_path) as f:
        correctness = json.load(f)
    manifest = entry.load_manifest()
    fns, sqls = entry._query_fns(), entry._oracle_sqls()
    updated = []
    for name, row in correctness.items():
        if name not in fns:
            continue  # renamed/removed since the driver ran
        if green(row):
            manifest[name] = {
                "hash": entry.definition_hash(name, fns, sqls),
                "round": round_no,
            }
            updated.append(name)
    with open(entry.MANIFEST_PATH, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"recorded {len(updated)} green entries at round {round_no}")
    stale = [n for n in fns if n not in manifest]
    if stale:
        print(f"never-verified (will lead the window): {stale}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]))
