#!/usr/bin/env python3
"""Regenerate RESULTS.md from the archived result JSONs (single source of
truth -- VERDICT round 1 flagged hand-edited results drifting apart).

    python scripts/gen_results_md.py
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def load(p):
    p = REPO / p
    return json.loads(p.read_text()) if p.exists() else None


def main():
    bench = None
    for r in range(9, 0, -1):
        b = load(f"BENCH_r{r:02d}.json")
        if b:
            # driver format: the JSON line is the last line of "tail"
            for line in reversed(b.get("tail", "").strip().splitlines()):
                try:
                    bench = json.loads(line)
                    break
                except json.JSONDecodeError:
                    continue
            if bench:
                break
    hs = load("results/round2/horizon_scaling.json")
    mb = load("results/stage_microbench_n64.json")
    kr = load("results/kernel_regression_tpu.json")
    ap = load("results/round2/all_pairs_oracle.json")
    tap = load("results/round2/tpu_all_pairs.json")

    L = []
    L.append("# Results (generated -- do not hand-edit)\n")
    L.append("Regenerate with `python scripts/gen_results_md.py`.  All "
             "numbers from the archived JSONs cited per table; hardware is "
             "a single remote-attached TPU v5e unless noted.  The "
             "reference's real-time budget is 2000 us/control update "
             "(reference include/common/settings.cuh:76-78,173-175).\n")

    if bench:
        d = bench if isinstance(bench, dict) else {}
        det = d.get("detail", {})
        L.append("## Headline benchmark (bench.py)\n")
        L.append(f"- **{d.get('metric')}**: {d.get('value')} {d.get('unit')}"
                 f" ({d.get('vs_baseline')}x inside the 2 ms budget)")
        if det:
            L.append(f"- linsys `{det.get('linsys')}`, {det.get('n_updates')} "
                     f"updates, avg tracking error {det.get('avg_tracking_error_m')} m, "
                     f"avg SQP iters {det.get('avg_sqp_iters')}")
        L.append("")

    hs40 = load("results/round2/horizon_scaling_cap40.json")
    if hs40:
        n512b = load("results/round2/horizon_n512_cap16.json")
        L.append("## Horizon scaling, TPU-retuned caps "
                 "(results/round2/horizon_scaling_cap40.json)\n")
        L.append("| N | cap | us/update | vs 2 ms budget | avg err (m) |")
        L.append("|---|---|---|---|---|")
        for key, row in hs40.get("rows", {}).items():
            if "error" in row:
                continue
            n_ = key.replace("n", "", 1).split("_", 1)[0]
            us = row["us_per_update"]
            L.append(f"| {n_} | 40 | {us} | {2000.0 / us:.2f}x | "
                     f"{row['avg_tracking_error_m']} |")
        if n512b:
            row = n512b["rows"].get("n512_pcg", {})
            if row and "error" not in row:
                us = row["us_per_update"]
                L.append(f"| 512 | 16 | {us} | {2000.0 / us:.2f}x | "
                         f"{row['avg_tracking_error_m']} |")
        L.append("")

    if hs:
        L.append("## Horizon scaling, reference-tuned caps "
                 "(results/round2/horizon_scaling.json)\n")
        L.append(f"Device-resident closed loop ({hs.get('n_updates')} updates,"
                 " fused stage kernels, per-N reference-tuned exit tols).\n")
        L.append("| N | solver | us/update | vs 2 ms budget | avg err (m) | "
                 "avg PCG iters/update |")
        L.append("|---|---|---|---|---|---|")
        for key, row in hs.get("rows", {}).items():
            if "error" in row:
                L.append(f"| {key} | | ERROR: {row['error'][:60]} | | | |")
                continue
            n, solver = key.replace("n", "", 1).split("_", 1)
            us = row["us_per_update"]
            L.append(f"| {n} | {solver} | {us} | {2000.0 / us:.2f}x | "
                     f"{row['avg_tracking_error_m']} | "
                     f"{row['avg_pcg_iters_per_update']} |")
        L.append("")

    if mb:
        L.append("## Per-stage device times, N=64 "
                 "(results/stage_microbench_n64.json)\n")
        L.append("| stage | us/iteration |")
        L.append("|---|---|")
        for k, v in mb.items():
            if isinstance(v, dict) and "us_per_iter" in v:
                L.append(f"| {k} | {v['us_per_iter']} |")
        for k, v in mb.items():
            if isinstance(v, (int, float)) and k.startswith(
                    ("sqp_", "loop_", "pcg_us")):
                L.append(f"| {k} | {v} |")
        L.append("")

    cs = load("results/round2/cap_sweep.json")
    if cs:
        L.append("## PCG iteration-cap retuning, N=64 "
                 "(results/round2/cap_sweep.json)\n")
        L.append(cs.get("note", "") + "\n")
        L.append("| config | us/update | avg err (m) | max err (m) | "
                 "PCG iters/update |")
        L.append("|---|---|---|---|---|")
        for k, r in cs.get("rows", {}).items():
            L.append(f"| {k} | {r['us']} | {r['err']} | {r['err_max']} | "
                     f"{r['pcg_iters']} |")
        L.append("")

    if kr:
        n_ok = sum(1 for v in kr.values()
                   if isinstance(v, dict) and v.get("ok") is True)
        n_bad = sum(1 for v in kr.values()
                    if isinstance(v, dict) and v.get("ok") is False)
        L.append("## Hardware kernel regression "
                 "(results/kernel_regression_tpu.json)\n")
        L.append(f"- {n_ok} checks OK, {n_bad} failing; all_ok="
                 f"{kr.get('all_ok')} on {kr.get('device')}")
        for k, v in kr.items():
            if isinstance(v, dict) and v.get("ok") is False:
                L.append(f"- FAIL `{k}`: "
                         + ", ".join(f"{a}={b}" for a, b in v.items()
                                     if a not in ("ok", "error"))[:160])
        L.append("")

    if ap:
        s = ap.get("summary", {})
        L.append("## All-pairs PCG vs QDLDL oracle (CPU, truncated "
                 "protocol; results/round2/all_pairs_oracle.json)\n")
        L.append(f"- {s.get('pairs_run', len(ap.get('rows', {})))} fixture "
                 f"pairs, N={ap.get('knots')}, first {ap.get('max_timesteps')}"
                 " trajectory rows (same protocol both solvers)")
        if s:
            L.append(f"- tracking-error ratio PCG/QDLDL: median "
                     f"{s.get('err_ratio_median')}, worst "
                     f"{s.get('err_ratio_worst')}; PCG iteration envelope max "
                     f"{s.get('pcg_iters_envelope_max')}")
        L.append(f"- {ap.get('eepos_provenance', '')}")
        L.append("")

    if tap:
        L.append("## All-pairs full-trajectory tracking on TPU "
                 "(results/round2/tpu_all_pairs.json)\n")
        L.append("| pair | pcg err (m) | bcr err (m) | pcg us/upd | "
                 "bcr us/upd |")
        L.append("|---|---|---|---|---|")
        for key, row in tap.get("rows", {}).items():
            p, b = row.get("pcg", {}), row.get("bcr", {})
            L.append(f"| {key} | {p.get('avg_tracking_error_m')} | "
                     f"{b.get('avg_tracking_error_m')} | "
                     f"{p.get('us_per_update')} | {b.get('us_per_update')} |")
        L.append("")

    L.append("## Analysis (round 2)\n")
    L.append(
        "- **Solver stability vs speed.** The exact block-cyclic-reduction "
        "solve is 13x faster per solve than tuned PCG (13.6 vs ~160 us at "
        "N=64) and short runs (64 updates) track as well or better -- but "
        "256-update runs drift monotonically (0.005 -> 0.44 m tracking "
        "error). Cause, established against an f64 oracle: cond(S) ~ 2.5e7 "
        "and f32 cyclic reduction is not backward stable (residual stalls "
        "at ~3e-3; iterative refinement beyond one pass makes the solution "
        "worse). Its noise lives in S's near-null long-horizon modes, "
        "invisible to the eta exit metric; warm-started Krylov iterations "
        "(the reference's design) never excite those modes, which is why "
        "PCG is stable at the same nominal residual. The `bcr_pcg` "
        "hybrid (warm CG with the BCR solve as preconditioner) cuts the "
        "drift ~5x but does not eliminate it (0.22 m avg at 256 updates, "
        "both at 3 and 6 fixed iterations) -- the noise re-enters through "
        "every preconditioner apply. Flagship stays `pcg`; `bcr`/"
        "`bcr_pcg` serve single-solve and throughput studies.")
    L.append(
        "- **The round-1 N=32-slower-than-N=64 inversion** is "
        "tolerance-bound, not size-bound: the reference-tuned 5e-6 exit "
        "tolerance drives ~233 PCG iterations/update at N=32 vs ~519 at "
        "N=64's 5e-5 (horizon_scaling.json) -- with the exact solver the "
        "inversion disappears.")
    L.append(
        "- **Closed-loop cost structure at N=64**: ~310 us/update non-SQP "
        "base (rollout + shift + bookkeeping) + ~50-135 us per SQP "
        "iteration depending on solver (stage_microbench_n64.json); the "
        "whole-iteration megakernel holds the marginal iteration at 55 us "
        "(bit-exact vs the staged path on hardware).")
    L.append(
        "- **Per-N cap retuning closes the long-horizon gap**: with the "
        "TPU-tuned caps (PCGConfig.tpu_tuned_max_iter) every swept "
        "horizon meets the 2 ms budget, including N=512 at 1.84 ms "
        "(cap 16, parity error 0.031 m) -- vs 6.3 ms in round 1.")
    L.append("")

    (REPO / "RESULTS.md").write_text("\n".join(L) + "\n")
    print(f"-> {REPO / 'RESULTS.md'}")


if __name__ == "__main__":
    main()
