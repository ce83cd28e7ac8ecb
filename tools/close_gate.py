"""Round close-gate: make the round-close claims honest BY CONSTRUCTION
(round-4 VERDICT ask #2 — BASELINE.md claimed "364 pytest green" while
HEAD failed one test, because the suite ran before the last code
commit).

Run this AFTER the final code commit of the round. It:

  1. refuses to run on a dirty working tree (the numbers must describe
     a commit, not a mixture),
  2. re-runs the full pytest suite and parses the counts from pytest's
     own summary line,
  3. re-runs the strict sf0.01 sweep via check_entry and reads the
     counts from the manifest it writes,
  4. writes build/close_gate.json with {git_sha, pytest, sweep} taken
     verbatim from those runs — the numbers BASELINE.md quotes.

Usage:
    python tools/close_gate.py [--skip-sweep] [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

sys.path.insert(0, ".")


def sh(cmd: list[str], timeout: int | None = None) -> subprocess.CompletedProcess:
    return subprocess.run(
        cmd, capture_output=True, text=True, timeout=timeout
    )


def main() -> int:
    args = sys.argv[1:]
    skip_sweep = "--skip-sweep" in args
    args = [a for a in args if a != "--skip-sweep"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    dirty = sh(["git", "status", "--porcelain"]).stdout.strip()
    if dirty:
        print("close_gate: REFUSING — working tree is dirty:\n" + dirty)
        print("commit (or stash) first; the gate certifies a commit.")
        return 2
    sha = sh(["git", "rev-parse", "HEAD"]).stdout.strip()
    print(f"close_gate: certifying {sha}")

    out: dict = {"git_sha": sha}

    print("close_gate: running full pytest suite ...")
    p = sh(
        [sys.executable, "-m", "pytest", "tests/", "-q", "--tb=no"],
        timeout=3600,
    )
    tail = (p.stdout or "").strip().splitlines()
    summary = tail[-1] if tail else ""
    print(f"  pytest: {summary}")
    counts = dict(
        (kind, int(n))
        for n, kind in re.findall(r"(\d+) (passed|failed|error|skipped)", summary)
    )
    out["pytest"] = {
        "summary": summary,
        "passed": counts.get("passed", 0),
        "failed": counts.get("failed", 0) + counts.get("error", 0),
        "returncode": p.returncode,
    }

    if not skip_sweep:
        print(f"close_gate: running strict sweep at {sf_dir} ...")
        manifest_path = "build/close_gate_sweep.json"
        os.makedirs("build", exist_ok=True)
        s = sh(
            [
                sys.executable,
                "tools/check_entry.py",
                "--strict",
                sf_dir,
                "--manifest",
                manifest_path,
            ],
            timeout=5400,
        )
        try:
            with open(manifest_path) as f:
                m = json.load(f)
            out["sweep"] = {
                "sf_dir": m["sf_dir"],
                "totals": m["totals"],
                "leaked_total": m.get("leaked_total"),
                "returncode": s.returncode,
            }
            print(f"  sweep: {m['totals']} leaked={m.get('leaked_total')}")
        except FileNotFoundError:
            out["sweep"] = {"error": "manifest not written", "returncode": s.returncode}
            print("  sweep: FAILED to produce manifest")

    os.makedirs("build", exist_ok=True)
    with open("build/close_gate.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("close_gate: wrote build/close_gate.json — quote THESE numbers.")
    ok = out["pytest"]["returncode"] == 0 and (
        skip_sweep or out.get("sweep", {}).get("returncode") == 0
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
