"""One-time backfill of ``bench_windows.jsonl`` from BENCH.md's git history.

Every full bench run refreshes BENCH.md's per-window scaling tables, so the
window-level measurements of PAST runs survive only in git history. This
walks every committed version of BENCH.md, parses the three N-vs-4N scaling
tables, dedupes rows (a table persists unchanged across commits until the
next refresh), and attributes each distinct window to the commit that first
recorded it. The output is the persistent per-window evidence pool that
``bench.py`` appends to going forward and folds into the driver artifact
(``scaling_window_pool``).

Honesty rules: every window ever recorded is kept — clean and noisy, high
and low — with its probe/steal/ceiling readings verbatim. Nothing here
re-judges cleanliness; the pool fold downstream uses the recorded flags.
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_PATH = os.path.join(REPO, "bench_windows.jsonl")

SECTION_MODE = {
    "## Scaling — N vs 4N EXECUTORS": "executors",
    "## Scaling — 1 vs 4 executors at 4->16 cores": "executors_small",
    "## Scaling — N vs 4N cores, single JVM": "threads",
}


def _commits() -> list[tuple[str, str]]:
    """(sha, iso_date) for every commit touching BENCH.md, oldest first."""
    out = subprocess.run(
        ["git", "log", "--reverse", "--format=%H %cI", "--", "BENCH.md"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    return [tuple(ln.split(" ", 1)) for ln in out.strip().splitlines() if ln]


def _parse_tables(text: str) -> list[dict]:
    """All per-window rows in one BENCH.md version, tagged with mode."""
    rows: list[dict] = []
    mode = None
    for ln in text.splitlines():
        if ln.startswith("## "):
            mode = next(
                (m for head, m in SECTION_MODE.items() if ln.startswith(head)),
                None,
            )
            continue
        if mode is None or not re.match(r"\|\s*\d+\s*\|", ln):
            continue
        cells = [c.strip() for c in ln.split("|")[1:-1]]
        if len(cells) not in (12,):
            continue  # only the full 12-column window format is poolable
        try:
            probes = json.loads(cells[5])
            steal_lo, steal_hi = (float(x) for x in cells[6].split("/"))
            rows.append({
                "mode": mode,
                "window": int(cells[0]),
                "order": cells[1],
                "low_s": float(cells[2]),
                "high_s": float(cells[3]),
                "eff": float(cells[4]),
                "probes_rel": probes,
                "low_steal": steal_lo,
                "high_steal": steal_hi,
                "clean": cells[7] == "yes",
                "cpu_ceiling": float(cells[8]),
                "membw_ceiling": float(cells[9]),
                "randaccess_ceiling": float(cells[10]),
                "eff_over_gather": float(cells[11]),
            })
        except (ValueError, json.JSONDecodeError):
            continue
    return rows


def _key(r: dict) -> tuple:
    return (r["mode"], r["low_s"], r["high_s"], r["eff"])


def main() -> None:
    seen: dict[tuple, dict] = {}
    for sha, date in _commits():
        blob = subprocess.run(
            ["git", "show", f"{sha}:BENCH.md"],
            cwd=REPO, capture_output=True, text=True,
        )
        if blob.returncode != 0:
            continue
        for row in _parse_tables(blob.stdout):
            k = _key(row)
            if k not in seen:
                row["recorded_utc"] = date
                row["source"] = f"BENCH.md@{sha[:9]}"
                seen[k] = row

    # The working-tree BENCH_partial.json carries the most recent run's
    # windows even when that run never refreshed BENCH.md (deadline kills
    # the secondary modes before the refresh gate). Pool those too.
    partial = os.path.join(REPO, "BENCH_partial.json")
    if os.path.exists(partial):
        try:
            d = json.load(open(partial))
            for key, mode in (
                ("scaling_executors_small", "executors_small"),
                ("scaling_executors", "executors"),
                ("scaling_threads", "threads"),
            ):
                s = d.get(key)
                for w in (s or {}).get("windows", []):
                    row = {
                        "mode": mode,
                        "window": w["window"],
                        "order": "→".join(w.get("order", [])),
                        "low_s": w["low_s"],
                        "high_s": w["high_s"],
                        "eff": w["eff"],
                        "probes_rel": w.get("probes_rel"),
                        "low_steal": w.get("low_steal"),
                        "high_steal": w.get("high_steal"),
                        "clean": bool(w.get("clean")),
                        "cpu_ceiling": w.get("cpu_ceiling"),
                        "membw_ceiling": w.get("membw_ceiling"),
                        "randaccess_ceiling": w.get("randaccess_ceiling"),
                        "eff_over_gather": w.get("eff_normalized_randaccess"),
                        "retried": w.get("retried"),
                    }
                    k = _key(row)
                    if k not in seen:
                        row["recorded_utc"] = d.get("run_utc") or "working-tree"
                        row["source"] = "BENCH_partial.json"
                        seen[k] = row
        except (json.JSONDecodeError, KeyError):
            pass

    rows = sorted(seen.values(), key=lambda r: (r["recorded_utc"], r["mode"], r["window"]))
    with open(OUT_PATH, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    by_mode: dict[str, list[dict]] = {}
    for r in rows:
        by_mode.setdefault(r["mode"], []).append(r)
    for mode, rs in sorted(by_mode.items()):
        clean = sorted(r["eff"] for r in rs if r["clean"])
        print(f"{mode}: {len(rs)} windows, {len(clean)} clean"
              + (f", clean effs {clean}" if clean else ""))
    print(f"wrote {len(rows)} rows to {OUT_PATH}")


if __name__ == "__main__":
    main()
    sys.exit(0)
