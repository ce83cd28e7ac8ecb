"""Merge partial strict-sweep manifests (a resumed sweep's parts) into
one committed manifest. Part 1 may be a parsed-from-log dict (plain
name → entry mapping); part 2+ are check_entry --manifest files with
{"queries": {...}} structure. Usage:

    python tools/merge_sweep_manifests.py OUT part1.json part2.json ...
"""

from __future__ import annotations

import datetime
import json
import sys

sys.path.insert(0, ".")


def load_entries(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    return d.get("queries", d)


def main() -> int:
    out, *parts = sys.argv[1:]
    merged: dict[str, dict] = {}
    for p in parts:
        merged.update(load_entries(p))
    counts: dict[str, int] = {}
    for m in merged.values():
        counts[m["status"]] = counts.get(m["status"], 0) + 1
    import __spark_entry__ as e

    all_names = set(e.queries())
    missing = sorted(all_names - set(merged))
    with open(out, "w") as f:
        json.dump(
            {
                "sf_dir": "/root/testdata/sf0.1",
                "strict": True,
                "generated_at": datetime.datetime.now(
                    datetime.timezone.utc
                ).isoformat(timespec="seconds"),
                "totals": counts,
                "not_run": missing,
                "queries": merged,
            },
            f,
            indent=1,
            sort_keys=True,
        )
    print(f"{out}: {sum(counts.values())} entries {counts}; "
          f"{len(missing)} not run")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
