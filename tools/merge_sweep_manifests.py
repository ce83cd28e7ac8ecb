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


def load_part(path: str) -> tuple[dict, str | None]:
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d["queries"], d.get("sf_dir")
    return d, None


def main() -> int:
    out, *parts = sys.argv[1:]
    # sf_dir comes from the parts (all must agree), overridable with a
    # leading --sf-dir flag — the round-4 version hardcoded sf0.1, so
    # merging sf0.01 parts produced a manifest mislabeling which corpus
    # it certified (round-4 ADVICE).
    sf_dir = None
    if parts and parts[0] == "--sf-dir":
        sf_dir = parts[1]
        parts = parts[2:]
    merged: dict[str, dict] = {}
    for p in parts:
        entries, part_sf = load_part(p)
        if part_sf is not None:
            if sf_dir is None:
                sf_dir = part_sf
            elif part_sf != sf_dir:
                raise SystemExit(
                    f"part {p} is for {part_sf}, but merging as {sf_dir}"
                )
        merged.update(entries)
    if sf_dir is None:
        raise SystemExit(
            "no part carries an sf_dir — pass --sf-dir DIR explicitly"
        )
    counts: dict[str, int] = {}
    for m in merged.values():
        counts[m["status"]] = counts.get(m["status"], 0) + 1
    import __spark_entry__ as e

    all_names = set(e.queries())
    missing = sorted(all_names - set(merged))
    with open(out, "w") as f:
        json.dump(
            {
                "sf_dir": sf_dir,
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
