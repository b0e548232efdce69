"""Pre-registered alternating scaling cycles for one (N, 4N) pair.

Methodology (fixed BEFORE running; no cycle is discarded):
  - `--cycles` back-to-back cycles, each = one spark-submit probe at
    local[N] then one at local[4N] over the IDENTICAL pre-generated input
    (jobs/scaling_probe.py via --py-files zip; per-probe steal% recorded
    in-process around the timed window).
  - Reported: every cycle row, the median efficiency over ALL cycles, and
    the clean-window median (cycles where BOTH probes saw <= the steal
    threshold) — the shared-host analog of an idle-cluster measurement.
  - A pure-Python multiprocessing control of the same per-turn workload
    at the same worker counts bounds what the HOST can grant; the
    control-normalized ratio isolates the engine's own scaling term.

Merges results into BENCH/scaling.json under pair-specific keys without
touching other pairs' recorded evidence.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
from datetime import datetime, timezone

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(cmd, **kw):
    print("+", " ".join(cmd), file=sys.stderr)
    return subprocess.run(cmd, check=True, capture_output=True, text=True, **kw)


def probe(cores: int, zip_path: str, data: str, runs: int) -> dict:
    out = sh(
        [
            "spark-submit",
            "--master", f"local[{cores}]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.driver.memory=8g",
            "--conf", f"spark.sql.shuffle.partitions={cores * 2}",
            "--conf", "spark.sql.files.maxPartitionBytes=32m",
            "--py-files", zip_path,
            os.path.join(ROOT, "jobs/scaling_probe.py"),
            "--input", data,
            "--runs", str(runs),
        ]
    ).stdout
    return json.loads([l for l in out.splitlines() if l.startswith("{")][-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--convs", type=int, default=1000000)
    ap.add_argument("--cycles", type=int, default=9)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--clean-steal", type=float, default=0.5)
    ap.add_argument("--skip-control", action="store_true")
    args = ap.parse_args()
    n, n4 = args.n, 4 * args.n

    zip_path = sh(
        [sys.executable, os.path.join(ROOT, "tools/build_pyfiles.py")]
    ).stdout.strip()
    data = os.path.join(ROOT, ".bench_data", f"transcripts_{args.convs}")
    if not os.path.exists(os.path.join(data, "_SUCCESS")):
        raise SystemExit(f"input not generated: {data} (run bench_scaling.py once)")

    cycles = []
    for c in range(args.cycles):
        lo = probe(n, zip_path, data, args.runs)
        hi = probe(n4, zip_path, data, args.runs)
        row = {
            "cycle": c,
            f"t{n}": lo["turns_per_sec"],
            f"t{n4}": hi["turns_per_sec"],
            f"eff_{n}_{n4}": round(
                hi["turns_per_sec"] / (4.0 * lo["turns_per_sec"]), 3
            ),
            f"steal{n}": lo["steal_pct"],
            f"steal{n4}": hi["steal_pct"],
        }
        cycles.append(row)
        print(json.dumps(row), file=sys.stderr)

    effs = [r[f"eff_{n}_{n4}"] for r in cycles]
    clean = [
        r[f"eff_{n}_{n4}"]
        for r in cycles
        if r[f"steal{n}"] <= args.clean_steal
        and r[f"steal{n4}"] <= args.clean_steal
    ]

    control = None
    if not args.skip_control:
        from bench_scaling import _pure_python_control

        sys.path.insert(0, ROOT)
        control = _pure_python_control([n, n4])

    path = os.path.join(ROOT, "BENCH", "scaling.json")
    doc = json.load(open(path)) if os.path.exists(path) else {}
    key = f"{n}_{n4}"
    doc[f"cycles_{key}"] = cycles
    doc[f"eff_{key}_all"] = effs
    doc[f"eff_{key}_median"] = round(statistics.median(effs), 3)
    doc[f"eff_{key}_clean_window_median"] = (
        round(statistics.median(clean), 3) if clean else None
    )
    doc[f"eff_{key}_clean_windows"] = len(clean)
    if control:
        ctl_eff = round(control[n4] / (4.0 * control[n]), 3)
        doc.setdefault("pure_python_control_turns_per_sec", {})
        doc["pure_python_control_turns_per_sec"].update(
            {str(n): control[n], str(n4): control[n4]}
        )
        doc[f"control_eff_{key}"] = ctl_eff
        doc[f"engine_relative_to_hardware_{key}"] = round(
            doc[f"eff_{key}_median"] / ctl_eff, 3
        )
    doc[f"method_{key}"] = (
        f"{args.cycles} pre-registered alternating local[{n}]<->local[{n4}] "
        f"cycles, none discarded; per-probe steal from /proc/stat around "
        f"the timed window; clean window = both probes <= "
        f"{args.clean_steal}% steal"
    )
    doc["generated_at"] = datetime.now(timezone.utc).isoformat()
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps({k: doc[k] for k in doc if key in k or k == "generated_at"}))


if __name__ == "__main__":
    main()
