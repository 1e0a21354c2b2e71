#!/usr/bin/env python3
"""Assemble SWEEP_r{N}.json from a set of SweepVerify output dirs: for each
dir, run the check_correctness compare (--skip-verify) against its sf dir and
collect the per-draw results keyed as {label: {seed: {draw: result}}}.
Usage: assemble_sweep.py OUT.json label:seed:sfdir:dir [...]
"""
import sys, json, subprocess

out_path = sys.argv[1]
agg = {}
total = 0
all_green = True
for spec in sys.argv[2:]:
    label, seed, sfdir, d = spec.split(":")
    r = subprocess.run(
        [sys.executable, "tools/check_correctness.py", sfdir, d, "--skip-verify"],
        cwd="/root/repo", capture_output=True, text=True)
    # a checker CRASH (no JSON on stdout) must name the failing spec and
    # keep assembling the rest, not abort the whole assembly
    end = r.stdout.rfind("}")
    try:
        if end == -1:
            raise ValueError("no JSON object on checker stdout")
        res = json.loads(r.stdout[:end + 1])
    except (ValueError, json.JSONDecodeError) as e:
        all_green = False
        sys.stderr.write(f"{label} seed{seed}: checker crashed ({e}); "
                         f"stderr tail: {r.stderr[-2000:]}\n")
        agg.setdefault(label, {})[f"seed{seed}"] = {
            "__checker_crash__": str(e)}
        continue
    agg.setdefault(label, {})[f"seed{seed}"] = res
    total += len(res)
    if r.returncode != 0:
        all_green = False
        sys.stderr.write(f"{label} seed{seed}: FAILURES\n")
agg["all_green"] = all_green
agg["total_draws"] = total
json.dump(agg, open(out_path, "w"), indent=1)
print(f"{out_path}: {total} draws, all_green={all_green}")
